"""Device ops: decode, scoring, top-k, intersection kernels."""
