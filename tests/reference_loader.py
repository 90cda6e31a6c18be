"""Load single modules from the read-only PyTorch reference for parity tests.

We import reference files directly (never copying their code into the
framework) to use them as numerical oracles on tiny geometries.  Missing
heavyweight deps (diffusers, flash-attn) are stubbed just enough for the
module under test to import.
"""
from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference"


def _ensure_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    diffusers = types.ModuleType("diffusers")
    cfg_utils = types.ModuleType("diffusers.configuration_utils")
    mdl_utils = types.ModuleType("diffusers.models.modeling_utils")
    models = types.ModuleType("diffusers.models")

    class ConfigMixin:
        pass

    class ModelMixin:
        def __init_subclass__(cls, **kw):
            super().__init_subclass__(**kw)

    def register_to_config(fn):
        return fn

    cfg_utils.ConfigMixin = ConfigMixin
    cfg_utils.register_to_config = register_to_config
    mdl_utils.ModelMixin = ModelMixin
    diffusers.configuration_utils = cfg_utils
    diffusers.models = models
    models.modeling_utils = mdl_utils
    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.configuration_utils"] = cfg_utils
    sys.modules["diffusers.models"] = models
    sys.modules["diffusers.models.modeling_utils"] = mdl_utils


def load_ref_module(relpath: str, name: str, package_root: str | None = None):
    """Load a reference file as module ``name``.

    If the file uses relative imports, pass ``package_root`` (e.g.
    'refwan' with __path__ pointing at wan/modules).
    """
    _ensure_diffusers_stub()
    path = f"{REF}/{relpath}"
    if package_root and package_root not in sys.modules:
        pkg = types.ModuleType(package_root)
        pkg.__path__ = [f"{REF}/wan/modules"]
        sys.modules[package_root] = pkg
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_scheduler():
    return load_ref_module("utils/scheduler.py", "ref_scheduler")


def load_ref_wan_model():
    """Load wan/modules/model.py under package 'refwan' (torch CPU)."""
    load_ref_module("wan/modules/attention.py", "refwan.attention", "refwan")
    return load_ref_module("wan/modules/model.py", "refwan.model", "refwan")
