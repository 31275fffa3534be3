"""Reference-parity harness: shims + runner (see refshims/README.md)."""
