"""Loads the reference's own utils/metrics.py (the only utils module present
upstream) so accuracy semantics are authoritative, not reconstructed."""

import importlib.util
import os

_path = os.environ.get("PARITY_REFERENCE_DIR", "/root/reference")
_spec = importlib.util.spec_from_file_location(
    "_reference_metrics", os.path.join(_path, "utils", "metrics.py"))
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

calculate_accuracy = _mod.calculate_accuracy
calculate_accuracy_hamm_dist = _mod.calculate_accuracy_hamm_dist
