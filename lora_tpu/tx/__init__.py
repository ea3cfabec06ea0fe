"""LoRa transmitter (modulator).

The reference has no tx path; this package exists so the framework can
generate hermetic SigMF test traces with known payloads, CFO, timing offset
and noise (SURVEY.md §4 "Implication for the TPU build"). The tx chain is
the exact inverse of the rx integer chain, validated by roundtrip tests.

Bin/waveform convention: the reference's default demodulator
(``max_frequency_gradient_idx``, lib/decoder_impl.cc:466-491) reads a
cyclic-shifted upchirp ``u[(n + s*decim) % sps]`` as bin ``s - 1``; its
``fine_sync`` likewise tracks the waveform at ``shift_ref =
(bin_idx+1)*decim`` (lib/decoder_impl.cc:301). The modulator therefore
transmits bin ``b`` as waveform shift ``s = b + 1``. The single wrap case
``b = 2^sf - 1`` (s = 0) is ambiguous to the gradient demod and decodes as
bin 0; the resulting one-symbol error is corrected by Hamming(8,4)/(7,4)
for CR 4/7-4/8 (one bit per codeword after deinterleaving) and may corrupt
a nibble at CR 4/5-4/6 — mirroring the reference's own accuracy profile on
hardware traces.
"""

from .modulator import Modulator, modulate_frame  # noqa: F401
