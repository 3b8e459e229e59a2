"""Import pieces of the reference implementation (/root/reference) as CPU
torch test oracles.

The reference package assumes a CUDA box with exotic deps (pcre, logbar,
device_smi, ...). We stub just enough of those for the pure-math modules —
quantizer/gptq/packing — to import and run on CPU. Used by
tests/test_reference_parity.py; legitimate validation use, not code reuse.
"""

from __future__ import annotations

import logging
import re
import sys
import types

REF = "/root/reference"
_installed = False


def _stub(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_reference(extra_stubs: dict | None = None):
    """Make `import gptqmodel.<...>` resolve against /root/reference with
    hardware/telemetry deps stubbed. Idempotent."""
    global _installed
    if _installed:
        return
    if REF not in sys.path:
        sys.path.insert(0, REF)

    class _Flag:
        """pcre.Flag with PCRE names mapped to re equivalents."""

        CASELESS = re.IGNORECASE
        MULTILINE = re.MULTILINE
        DOTALL = re.DOTALL
        IGNORECASE = re.IGNORECASE
        VERBOSE = re.VERBOSE
        UNICODE = re.UNICODE

    _stub("pcre", compile=re.compile, Flag=_Flag, match=re.match,
          search=re.search, sub=re.sub, escape=re.escape,
          findall=re.findall, fullmatch=re.fullmatch, split=re.split)

    class _OnceFn:
        """Callable with the reference logger's `.once(...)` attribute."""

        def __init__(self, fn):
            self._fn = fn
            self.once = lambda *a, **k: None

        def __call__(self, *a, **k):
            return self._fn(*a, **k)

    class _Log(logging.Logger):
        def __getattribute__(self, name):
            v = super().__getattribute__(name)
            if name in ("info", "warn", "warning", "error", "debug", "critical"):
                return _OnceFn(v)
            return v

        def pb(self, it=None, *a, **k):
            class _PB:
                """Inert progress bar: every method chains, any kwargs."""

                def __init__(self, it):
                    if it is None:
                        it = []
                    elif isinstance(it, int):  # logbar: pb(total)
                        it = range(it)
                    self._it = it

                def __iter__(self):
                    return iter(self._it)

                def __len__(self):
                    return len(self._it)

                def __call__(self, it):
                    return iter(it)

                def __enter__(self):
                    return self

                def __exit__(self, *a):
                    return False

                def __getattr__(self, name):
                    if name.startswith("_"):
                        raise AttributeError(name)
                    return _Chain(self)

            class _Chain:
                """Inert attribute/call chain that resolves back to the PB
                (so ``pb.manual()`` keeps iterating the real items and
                ``columns.info.simulate(...)`` is harmlessly absorbed)."""

                def __init__(self, parent):
                    object.__setattr__(self, "_p", parent)

                def __call__(self, *a, **k):
                    return object.__getattribute__(self, "_p")

                def __getattr__(self, name):
                    if name.startswith("_"):
                        raise AttributeError(name)
                    return _Chain(object.__getattribute__(self, "_p"))

            return _PB(it)

        def spinner(self, *a, **k):
            return self.pb()

        def __getattr__(self, name):
            # any other UI surface (columns, summaries, ...) -> inert chain
            if name.startswith("_"):
                raise AttributeError(name)
            pb = self.pb()
            return lambda *a, **k: pb

    logging.setLoggerClass(_Log)
    lg = logging.getLogger("ref_oracle")
    logging.setLoggerClass(logging.Logger)

    class _LB:
        @staticmethod
        def shared(*a, **k):
            return lg

        @staticmethod
        def setup(*a, **k):
            return lg

    _stub("logbar", LogBar=_LB)

    class _Device:
        def __init__(self, *a, **k):
            self.memory_total = 1 << 34
            self.memory_used = 0

        def info(self):
            return self

    _stub("device_smi", Device=_Device)

    for name, attrs in (extra_stubs or {}).items():
        _stub(name, **attrs)
    _installed = True


def try_import(path: str):
    """Import a reference module path after install_reference(), adding
    stubs for any further leaf deps as they surface. Returns the module."""
    install_reference()
    import importlib

    for _ in range(12):
        try:
            return importlib.import_module(path)
        except ModuleNotFoundError as e:
            missing = e.name
            if missing is None or missing.startswith("gptqmodel"):
                raise
            _stub(missing)
    return importlib.import_module(path)


def load_exl3_quantize():
    """Load the reference's exllamav3 quantize lib (pure-torch parts:
    block_ldl, ldlq, codebook constants) WITHOUT the gptqmodel package
    __init__ chain: a fake package provides its relative deps (the CUDA
    ext facade and util helpers are stubbed — tests must only call the
    torch-only functions)."""
    import importlib.util

    install_reference()
    root = "_exl3"
    for name in (root, f"{root}.modules", f"{root}.modules.quant",
                 f"{root}.modules.quant.exl3_lib"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            sys.modules[name] = pkg

    class _NoExt:
        def __getattr__(self, k):
            raise RuntimeError(f"CUDA ext function {k} not available on CPU")

    _stub(f"{root}.ext", exllamav3_ext=_NoExt())
    util = _stub(f"{root}.util")
    util.__path__ = []
    class _PB:  # class (not lambda) so `x: ProgressBar | None` annotations work
        def __init__(self, *a, **k):
            self._it = a[0] if a else []

        def __iter__(self):
            return iter(self._it)

    _stub(f"{root}.util.progress", ProgressBar=_PB)
    _stub(f"{root}.util.memory", free_mem=lambda *a, **k: None)
    _stub(f"{root}.util.hadamard", get_hadamard_dt=lambda *a, **k: None)
    _stub(f"{root}.util.tensor", save_tensor_image=lambda *a, **k: None)

    spec = importlib.util.spec_from_file_location(
        f"{root}.modules.quant.exl3_lib.quantize",
        f"{REF}/gptqmodel/exllamav3/modules/quant/exl3_lib/quantize.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod
