"""Reference settings with BASE_DIR redirected to a writable directory.

The reference root scripts run ``tempfile.mkdtemp(dir=BASE_DIR/tmp)`` at
import time; /root/reference is read-only, so this shim (which shadows the
reference settings on sys.path) re-executes it and repoints BASE_DIR.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "_reference_settings", "/root/reference/settings.py"
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
globals().update(
    {k: v for k, v in vars(_mod).items() if not k.startswith("__")}
)

BASE_DIR = os.environ.get("REF_PARITY_BASE", "/tmp/ref_parity_base")
os.makedirs(os.path.join(BASE_DIR, "tmp"), exist_ok=True)
