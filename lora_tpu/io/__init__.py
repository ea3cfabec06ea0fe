"""Host-side IO: frame formats, SigMF traces, UDP/file/MongoDB sinks."""
