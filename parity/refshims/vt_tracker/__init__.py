"""vt_tracker adapter (only the visualization helper is imported)."""
