#!/usr/bin/env python
"""Regenerate docs/test-results/README.md from the per-suite reports,
stamping the JAX backend the engine reports were produced on."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs", "test-results")


def main():
    import jax

    backend = jax.default_backend()
    rows = []
    for name in sorted(os.listdir(DOCS)):
        if not name.endswith(".md") or name == "README.md":
            continue
        text = open(os.path.join(DOCS, name)).read()
        m = re.search(r"Total payloads passed:\s+(\d+) out of (\d+)\s+"
                      r"\(([\d.]+)%\)", text)
        if not m:
            continue
        rows.append((name, int(m.group(1)), int(m.group(2)), m.group(3)))

    with open(os.path.join(DOCS, "README.md"), "w") as f:
        f.write(f"""# Accuracy reports index

One report per (suite, engine); engine suffix `_dense` / `_parity`
(no suffix = golden). Regenerate any of them with:

    bash tools/regen_reports.sh

Backend: the jitted engines (dense, parity) in this index ran on the
**{backend}** backend (`jax.default_backend()` at regeneration time);
the golden engine is host numpy. Suites are hermetic and seeded, so
reports are deterministic across backends up to float argmax ties —
which is why the committed matrix is regenerated on the real TPU.

Reference comparison: gr-lora's committed OTA results on the same
384-payload matrix are 100.00% (USRP), 99.74% (HackRF), 98.96%
(RTL-SDR) — `/root/reference/docs/test-results/short_*.md`.

| report | passed | total | accuracy |
|---|---|---|---|
""")
        for name, p, t, acc in rows:
            f.write(f"| [{name}]({name}) | {p} | {t} | {acc}% |\n")
    print(f"indexed {len(rows)} reports (backend={backend})")


if __name__ == "__main__":
    main()
