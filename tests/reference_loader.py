"""Test-only loader for the upstream reference implementation at
/root/reference (read-only mount).  Parity tests import the reference's torch
modules directly and compare our JAX reimplementation against them with
shared random weights — the strongest possible golden check.  Everything here
is a TEST FIXTURE: nothing from the reference is copied into the framework.

Skips cleanly when the reference tree is absent (e.g. a different CI host).
"""

import os
import sys
import types

import pytest

REFERENCE_ROOT = "/root/reference"


def _install_stubs() -> None:
    """The reference's DA3 package imports addict/easydict/omegaconf, which
    are not in this image; give it minimal shims."""

    class _AttrDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

        def __delattr__(self, k):
            del self[k]

    if "addict" not in sys.modules:
        addict = types.ModuleType("addict")
        addict.Dict = _AttrDict
        sys.modules["addict"] = addict
    if "easydict" not in sys.modules:
        easydict = types.ModuleType("easydict")
        easydict.EasyDict = _AttrDict
        sys.modules["easydict"] = easydict
    if "omegaconf" not in sys.modules:
        omegaconf = types.ModuleType("omegaconf")

        class DictConfig(dict):
            pass

        class ListConfig(list):
            pass

        class OmegaConf:
            @staticmethod
            def create(x):
                return x

            @staticmethod
            def has_resolver(name):
                return True

            @staticmethod
            def register_new_resolver(*a, **k):
                pass

        omegaconf.DictConfig = DictConfig
        omegaconf.ListConfig = ListConfig
        omegaconf.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = omegaconf


def load_reference_da3():
    """Returns the reference's depth_anything_3 model modules, or skips."""
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "models", "depth_anything_3")):
        pytest.skip("reference tree not available")
    _install_stubs()
    for p in (os.path.join(REFERENCE_ROOT, "models"), REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    import depth_anything_3.model.dinov2.vision_transformer as vt
    import depth_anything_3.model.dualdpt as dualdpt
    import depth_anything_3.model.dpt as dpt
    import depth_anything_3.model.cam_dec as cam_dec

    return types.SimpleNamespace(vt=vt, dualdpt=dualdpt, dpt=dpt, cam_dec=cam_dec)


def load_reference_functions(relpath, names, globals_extra=None):
    """Extract top-level functions (and assignments, e.g. kernel caches) by
    name from a reference source file via AST and exec ONLY those nodes in a
    namespace with torch/F/np plus any supplied globals.

    This turns the reference's own source into the test oracle without
    importing the module (reference depth.py loads a model at import time,
    reference depth.py:1784-1789) — so the oracle cannot drift from the
    file it mirrors."""
    import ast

    import numpy as np
    import torch
    import torch.nn.functional as F

    path = os.path.join(REFERENCE_ROOT, relpath)
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    tree = ast.parse(open(path, encoding="utf-8").read())
    wanted = []
    found = set()

    def scan(body):
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) \
                    and node.name in names and node.name not in found:
                wanted.append(node)
                found.add(node.name)
            elif isinstance(node, ast.Assign) and any(
                    isinstance(t, ast.Name) and t.id in names
                    and t.id not in found
                    for t in node.targets):
                # first definition wins, same as for defs: a later rebind
                # like the reference's guarded
                # `make_sbs_core = torch_compile_with_runtime_fallback(...)`
                # (depth.py:2233-2235) must not shadow the extracted def —
                # its RHS isn't part of the extracted namespace anyway.
                # For a chained `A = B = rhs` where A was already extracted,
                # rebinding A would break first-definition-wins, so keep only
                # the not-yet-found targets on the extracted node.
                new_targets = [t for t in node.targets
                               if not (isinstance(t, ast.Name)
                                       and t.id in names and t.id in found)]
                node = ast.Assign(targets=new_targets, value=node.value)
                wanted.append(node)
                # record every matching target (a chained `A = B = ...` might
                # match on the second name only)
                found.update(t.id for t in new_targets
                             if isinstance(t, ast.Name) and t.id in names)
            elif isinstance(node, ast.If):
                # defs guarded by top-level platform switches (e.g. the
                # reference's `if IS_CUDA:` process(), depth.py:540);
                # first definition found wins, callers pick the branch by
                # listing only names unique to it
                scan(node.body)
                scan(node.orelse)

    scan(tree.body)
    missing = set(names) - found
    if missing:
        raise AssertionError(
            f"{relpath} no longer defines {sorted(missing)} at top level — "
            "update the parity tests to match the reference")
    ns = {"torch": torch, "F": F, "np": np, **(globals_extra or {})}
    mod = ast.Module(body=wanted, type_ignores=[])
    ast.fix_missing_locations(mod)
    exec(compile(mod, path, "exec"), ns)
    return ns


def load_reference_vda():
    """Returns the reference's VideoDepthAnything class, or skips."""
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "models", "video_depth_anything")):
        pytest.skip("reference tree not available")
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.video_depth_anything.vda2_s import VideoDepthAnything

    return VideoDepthAnything
