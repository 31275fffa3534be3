"""vt_shape_gen adapter (reference requirements.txt:37)."""
