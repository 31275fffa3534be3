"""mlflow stand-in covering the reference's tracking surface.

The reference scripts write results into a mkdtemp dir that they rmtree in
a ``finally`` — artifacts survive only through mlflow. So ``log_artifact``
/ ``log_artifacts`` genuinely copy into $REF_PARITY_ARTIFACTS (when set),
and metrics append to metrics.jsonl there; everything else is a no-op.
"""

import contextlib
import json
import os
import shutil
import uuid


def _artifact_root():
    root = os.environ.get("REF_PARITY_ARTIFACTS")
    if root:
        os.makedirs(root, exist_ok=True)
    return root


class _Experiment:
    experiment_id = "0"


class _RunInfo:
    def __init__(self):
        self.run_id = uuid.uuid4().hex
        self.run_uuid = self.run_id


class _Run:
    def __init__(self):
        self.info = _RunInfo()


_active = None


def set_tracking_uri(uri):
    pass


def set_experiment(name):
    return _Experiment()


@contextlib.contextmanager
def start_run(*args, **kwargs):
    global _active
    _active = _Run()
    try:
        yield _active
    finally:
        _active = None


def active_run():
    return _active


def log_param(key, value):
    pass


def log_params(params):
    pass


def log_metric(key, value, step=None):
    log_metrics({key: value}, step=step)


def log_metrics(metrics, step=None):
    root = _artifact_root()
    if not root:
        return
    with open(os.path.join(root, "metrics.jsonl"), "a") as f:
        f.write(json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()}}) + "\n")


def _copy_into(src, dst_root, artifact_path=None):
    dst_dir = os.path.join(dst_root, artifact_path) if artifact_path else dst_root
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, os.path.basename(src.rstrip("/")))
    if os.path.isdir(src):
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)


def log_artifact(path, artifact_path=None):
    root = _artifact_root()
    if root:
        _copy_into(path, root, artifact_path)


def log_artifacts(path, artifact_path=None):
    root = _artifact_root()
    if root:
        _copy_into(path, root, artifact_path)
