"""Config system: attribute dicts, yaml loading, run-dir management.

Capability parity with the reference's three config mechanisms (SURVEY
§5.6): ``dnnlib.EasyDict`` attribute dicts (``dnnlib/util.py:40-53``),
YAML configs, numbered run dirs ``NNNNN-<desc>`` with a
``training_options.json`` provenance dump
(``train_mi_multimodal.py:57-100``), and string→class reflection
(``construct_class_by_name``).
"""

from __future__ import annotations

import importlib
import json
import os
import re
from typing import Any, Optional


class EasyDict(dict):
    """Attribute-access dict (reference ``dnnlib/util.py:40-53``)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


def load_yaml(path: str) -> EasyDict:
    import yaml

    with open(path) as f:
        return _to_easydict(yaml.safe_load(f))


def _to_easydict(obj):
    if isinstance(obj, dict):
        return EasyDict({k: _to_easydict(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_to_easydict(v) for v in obj]
    return obj


def construct_class_by_name(*args, class_name: str, **kwargs) -> Any:
    """String → class instantiation (reference ``dnnlib/util.py:314-316``)."""
    module_name, _, attr = class_name.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, attr)(*args, **kwargs)


def allocate_run_dir(outdir: str, desc: str, dry_run: bool = False) -> str:
    """Next ``NNNNN-<desc>`` run dir (reference
    ``train_mi_multimodal.py:57-64``)."""
    os.makedirs(outdir, exist_ok=True)
    cur_ids = [
        int(m.group(1))
        for name in os.listdir(outdir)
        if (m := re.match(r"^(\d+)-", name))
    ]
    run_id = max(cur_ids, default=-1) + 1
    run_dir = os.path.join(outdir, f"{run_id:05d}-{desc}")
    if not dry_run:
        os.makedirs(run_dir, exist_ok=False)
    return run_dir


def dump_options(run_dir: str, options: dict, name: str = "training_options.json") -> None:
    with open(os.path.join(run_dir, name), "wt") as f:
        json.dump(options, f, indent=2, default=repr)


class Logger:
    """Tee stdout/stderr into ``<run_dir>/log.txt`` (reference
    ``dnnlib/util.py:56-117``)."""

    def __init__(self, file_name: Optional[str] = None, should_flush: bool = True):
        import sys

        self.file = open(file_name, "at") if file_name else None
        self.should_flush = should_flush
        self.stdout = sys.stdout
        self.stderr = sys.stderr
        sys.stdout = self
        sys.stderr = self

    def write(self, text: str) -> None:
        if len(text) == 0:
            return
        if self.file is not None:
            self.file.write(text)
        self.stdout.write(text)
        if self.should_flush:
            self.flush()

    def flush(self) -> None:
        if self.file is not None:
            self.file.flush()
        self.stdout.flush()

    def close(self) -> None:
        import sys

        self.flush()
        if sys.stdout is self:
            sys.stdout = self.stdout
        if sys.stderr is self:
            sys.stderr = self.stderr
        if self.file is not None:
            self.file.close()
            self.file = None
