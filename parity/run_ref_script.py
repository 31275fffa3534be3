"""Run an unmodified reference script with the refshims on sys.path.

Usage:
    python parity/run_ref_script.py <script.py> [script args...]

Ensures path order (shims -> reference -> repo), pre-patches latent
reference bugs that block import (``from phoneme_recognition import SIL``
— the package never exports it, train/test_phoneme_recognition.py:34), and
execs the script as __main__.
"""

import os
import runpy
import sys

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refshims")
REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    script = sys.argv[1]
    sys.argv = sys.argv[1:]
    for p in (REPO, REFERENCE, SHIMS):
        if p in sys.path:
            sys.path.remove(p)
        sys.path.insert(0, p)
    # Drop this wrapper's own directory (python puts the script dir first).
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path = [p for p in sys.path if os.path.abspath(p or ".") != here]

    # The reference targets numpy<1.24 (np.int/np.float aliases).
    import numpy as _np  # noqa: E402

    for _alias, _type in (("int", int), ("float", float), ("bool", bool),
                          ("object", object)):
        if not hasattr(_np, _alias):
            setattr(_np, _alias, _type)

    # Clamp t-SNE perplexity on tiny parity corpora (the reference's
    # feature plot hard-codes sklearn's default 30, which requires >30
    # samples). Must run before phoneme_recognition binds TSNE.
    import sklearn.manifold as _manifold  # noqa: E402

    _OrigTSNE = _manifold.TSNE

    class _SafeTSNE(_OrigTSNE):
        def fit_transform(self, X, y=None):
            n = len(X)
            if self.perplexity >= n:
                self.perplexity = max(1.0, (n - 1) / 3.0)
            return super().fit_transform(X, y)

    _manifold.TSNE = _SafeTSNE

    import phoneme_recognition  # noqa: E402  (the reference package)
    import settings  # noqa: E402  (the shimmed settings)

    for name in ("SIL", "BLANK", "UNKNOWN", "TRAIN", "VALID", "TEST"):
        if not hasattr(phoneme_recognition, name):
            setattr(phoneme_recognition, name, getattr(settings, name))

    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
