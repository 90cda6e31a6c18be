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

    import torch.nn as _nn

    class ModelMixin(_nn.Module):
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


def ensure_diffusers_scheduler_stub():
    """Richer diffusers stub so the reference fm_solvers modules import:
    a working register_to_config + scheduling_utils/utils submodules."""
    import inspect
    import types as _types

    _ensure_diffusers_stub()
    diffusers = sys.modules["diffusers"]
    if getattr(diffusers, "_scheduler_stub", False):
        return

    class _Config(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    class ConfigMixin2:
        def register_to_config(self, **kwargs):
            if not hasattr(self, "config"):
                self.config = _Config()
            self.config.update(kwargs)

    def register_to_config(init):
        sig = inspect.signature(init)

        def wrapped(self, *args, **kwargs):
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = _Config({k: v for k, v in bound.arguments.items()
                           if k != "self"})
            self.config = cfg
            init(self, *args, **kwargs)

        return wrapped

    cfg_utils = sys.modules["diffusers.configuration_utils"]
    cfg_utils.ConfigMixin = ConfigMixin2
    cfg_utils.register_to_config = register_to_config

    sched_pkg = _types.ModuleType("diffusers.schedulers")
    sched_utils = _types.ModuleType("diffusers.schedulers.scheduling_utils")

    class SchedulerMixin:
        pass

    class SchedulerOutput:
        def __init__(self, prev_sample=None):
            self.prev_sample = prev_sample

    import enum

    class KarrasDiffusionSchedulers(enum.Enum):
        DDIMScheduler = 1

    sched_utils.SchedulerMixin = SchedulerMixin
    sched_utils.SchedulerOutput = SchedulerOutput
    sched_utils.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers

    utils_mod = _types.ModuleType("diffusers.utils")
    utils_mod.deprecate = lambda *a, **k: None
    utils_mod.is_scipy_available = lambda: False
    torch_utils = _types.ModuleType("diffusers.utils.torch_utils")
    torch_utils.randn_tensor = None

    diffusers.schedulers = sched_pkg
    diffusers.utils = utils_mod
    sched_pkg.scheduling_utils = sched_utils
    utils_mod.torch_utils = torch_utils
    sys.modules["diffusers.schedulers"] = sched_pkg
    sys.modules["diffusers.schedulers.scheduling_utils"] = sched_utils
    sys.modules["diffusers.utils"] = utils_mod
    sys.modules["diffusers.utils.torch_utils"] = torch_utils
    diffusers._scheduler_stub = True


def load_ref_module(relpath: str, name: str, package_root: str | None = None):
    """Load a reference file as module ``name``.

    If the file uses relative imports, pass ``package_root`` (e.g.
    'refwan' with __path__ pointing at wan/modules).
    """
    _ensure_diffusers_stub()
    cached = sys.modules.get(name)
    if cached is not None and getattr(cached, "__ref_loader__", False):
        # session-scope: test files share one exec.  Only OUR loads are
        # reusable — some test files pre-register plain STUB modules
        # under the same names (e.g. test_pose_golden's empty
        # utils.wan_wrapper); those must be replaced by the real file.
        return cached
    path = f"{REF}/{relpath}"
    if package_root and package_root not in sys.modules:
        pkg = types.ModuleType(package_root)
        pkg.__path__ = [f"{REF}/wan/modules"]
        sys.modules[package_root] = pkg
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    mod.__ref_loader__ = True
    return mod


def load_ref_scheduler():
    return load_ref_module("utils/scheduler.py", "ref_scheduler")


def load_ref_fm_solvers():
    """Load the vendored diffusers flow-matching solvers as oracles."""
    ensure_diffusers_scheduler_stub()
    unipc = load_ref_module("wan/utils/fm_solvers_unipc.py", "ref_fm_unipc")
    dpm = load_ref_module("wan/utils/fm_solvers.py", "ref_fm_dpm")
    return unipc, dpm


def load_ref_wan_model():
    """Load wan/modules/model.py under package 'refwan' (torch CPU)."""
    load_ref_module("wan/modules/attention.py", "refwan.attention", "refwan")
    return load_ref_module("wan/modules/model.py", "refwan.model", "refwan")
