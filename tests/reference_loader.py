"""Import the reference's torch model modules for numerics-parity testing.

The reference ``models/__init__.py`` is broken as shipped (imports a class
that no longer exists — SURVEY.md §8.1), so we install a synthetic package
entry pointing at the directory and import the submodules directly.

Used only by tests; the framework itself never touches the reference.
"""

import importlib
import os
import sys
import types

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "models"))


def load_reference_model_modules():
    """Returns (tcn, convnet, attention, pose_model) reference modules."""
    if "models" not in sys.modules or not getattr(
            sys.modules["models"], "__wiflow_ref__", False):
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(REFERENCE_DIR, "models")]
        pkg.__wiflow_ref__ = True
        sys.modules["models"] = pkg
    tcn = importlib.import_module("models.tcn")
    convnet = importlib.import_module("models.convnet")
    attention = importlib.import_module("models.attention")
    pose_model = importlib.import_module("models.pose_model")
    return tcn, convnet, attention, pose_model
