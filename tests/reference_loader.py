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


def load_reference_augmentation():
    """Import /root/reference/utils/augmentation.py as a standalone module
    (bypassing the reference's package layout)."""
    import importlib.util
    path = os.path.join(REFERENCE_DIR, "utils", "augmentation.py")
    spec = importlib.util.spec_from_file_location("ref_augmentation", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_hpeli_zoo_modules():
    """Import the reference HPE-Li model package (stubbing torchvision,
    which is absent here and unused by the imported modules)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.Resize = object
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    hpeli_dir = os.path.join(REFERENCE_DIR, "cross_dataset_test", "HPE-Li")
    if hpeli_dir not in sys.path:
        sys.path.insert(0, hpeli_dir)
    no_denoiser = importlib.import_module("model.HPE_no_denoiser")
    wipose = importlib.import_module("model.HPE_Wipose")
    basic = importlib.import_module("model.HPE_basic_cnn")
    sknet_v2 = importlib.import_module("model.utils.SKNet_v2")
    trans_mmfi = importlib.import_module("model.sknet_trans_mmfi")
    trans_wipose = importlib.import_module("model.sknet_trans_wipose")
    return (no_denoiser, wipose, basic, sknet_v2, trans_mmfi, trans_wipose)


def load_denoiser_modules():
    """Import the reference HPE_{one..five}_denoiser modules (ordered)."""
    load_hpeli_zoo_modules()   # torchvision stub + sys.path setup
    names = ("one", "two", "three", "four", "five")
    return tuple(importlib.import_module(f"model.HPE_{n}_denoiser")
                 for n in names)
