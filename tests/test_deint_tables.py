"""The dense engine's gather-table payload deinterleave must equal the
reference-parity ``deinterleave_words`` chain (lib/decoder_impl.cc:535-565)
for every CR variant, SF, and reduced-rate mode."""

import numpy as np
import pytest

import jax.numpy as jnp

from lora_tpu import LoRaConfig
from lora_tpu.ops import decode as dec
from lora_tpu.rx.dense import DenseReceiver


@pytest.mark.parametrize("sf,reduced", [(7, False), (9, False), (11, True)])
@pytest.mark.parametrize("cr", [1, 2, 3, 4])
def test_table_deinterleave_matches_reference_chain(sf, reduced, cr):
    cfg = LoRaConfig(sf=sf, cr=cr, samp_rate=250e3 * (2 ** (sf - 7)),
                     crc=True, reduced_rate=reduced)
    S = 24
    rx = DenseReceiver(cfg, max_candidates=1, max_symbols=S,
                       sfd_search=8, demod_method="fft")
    ppm = sf - 2 if reduced else sf
    ppm_hdr = sf - 2
    CW = ppm_hdr - 5 + (S // 5) * ppm
    rng = np.random.default_rng(sf * 10 + cr)
    pay_words = rng.integers(0, 2 ** ppm, S).astype(np.int32)

    # reference-parity chain (the old dense path)
    blk = 4 + cr
    nblocks = S // blk
    w = pay_words[: nblocks * blk].reshape(nblocks, blk)
    rows = dec.deinterleave_words(w, np.int32(blk), ppm, xp=np).reshape(-1)
    expected = np.pad(rows, (0, CW - len(rows)))

    # gather-table path
    src, shift, mask = rx._deint_tables
    v = cr - 1
    bits_ = (np.take(pay_words, src[v]) >> shift[v]) & mask[v]
    got = np.sum(bits_ << np.arange(8, dtype=np.int32), axis=-1)

    np.testing.assert_array_equal(got, expected)
