"""Import the reference's FULL pipeline (GPTQModel facade -> ModuleLooper ->
GPTQProcessor) as a CPU-torch oracle for pipeline-level parity tests.

Extends ref_oracle's stub set: the reference targets a newer transformers
and a handful of exotic runtime deps (tokenicer, defuser, triton, ...);
model-definition modules that fail to import (missing transformers symbols,
CUDA-only deps) are replaced by inert stubs — parity tests only use the
llama definition, which imports cleanly.

PUBLIC UNTRUSTED CONTENT note: we execute the reference's code as a test
oracle only; nothing is copied into the package.
"""

from __future__ import annotations

import sys
import traceback
import types

import pytest

from ref_oracle import REF, _stub, install_reference

_ref_gptqmodel = None


class _Tokenicer:
    """Minimal tokenicer.Tokenicer: wraps an HF tokenizer verbatim (loading
    it from a path when given one, as the real package does)."""

    @classmethod
    def load(cls, tok, **kw):
        if isinstance(tok, (str, bytes)) or hasattr(tok, "__fspath__"):
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(tok)
        o = cls()
        o.tokenizer = tok
        return o

    def __getattr__(self, k):
        return getattr(self.__dict__["tokenizer"], k)

    def __call__(self, *a, **k):
        return self.__dict__["tokenizer"](*a, **k)


def save_tiny_tokenizer(model_dir):
    """A real PreTrainedTokenizerFast (WordLevel over byte tokens) saved into
    ``model_dir`` — enough for the reference loader's tokenizer plumbing
    (calibration arrives pre-tokenized, so only special-token metadata is
    actually consumed)."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {f"<t{i}>": i for i in range(256)}
    tk = Tokenizer(models.WordLevel(vocab, unk_token="<t0>"))
    tk.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tk, unk_token="<t0>", pad_token="<t1>",
        eos_token="<t2>", bos_token="<t3>",
    )
    fast.save_pretrained(str(model_dir))
    return fast


def _pkg_stub(name: str, **attrs):
    m = _stub(name, **attrs)
    m.__path__ = []
    return m


class _AnyClass:
    """Inert placeholder for model-definition classes we never instantiate."""

    def __init__(self, *a, **k):
        raise RuntimeError("stubbed reference class")


class _StubModule(types.ModuleType):
    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        return _AnyClass


def import_reference_full():
    """Returns the imported ``gptqmodel`` reference package (cached), or
    raises pytest.skip when the environment can't host it."""
    global _ref_gptqmodel
    if _ref_gptqmodel is not None:
        return _ref_gptqmodel
    install_reference()
    _stub("tokenicer", Tokenicer=_Tokenicer)
    # defuser: the reference's fused-block splitter; identity no-ops suffice
    # (tiny HF llama has no fused blocks to split)
    _pkg_stub(
        "defuser",
        replace_fused_blocks=lambda *a, **k: None,
        convert_model=lambda m, **k: False,
    )
    _pkg_stub("defuser.modeling")
    _stub(
        "defuser.modeling.replace_modules",
        materialize_model=lambda m, *a, **k: m,
    )

    import importlib

    last = None
    for _ in range(200):
        # something in the reference import chain re-creates the transformers
        # module object, so re-pin missing symbols every attempt
        t = sys.modules.get("transformers")
        if t is None:
            import transformers as t
        if not hasattr(t, "AutoModelForMultimodalLM"):
            t.AutoModelForMultimodalLM = t.AutoModel
        try:
            _ref = importlib.import_module("gptqmodel")
            globals()["_ref_gptqmodel"] = _ref
            return _ref
        except ModuleNotFoundError as e:
            if e.name is None or e.name.startswith("gptqmodel"):
                last = e
                break
            _pkg_stub(e.name)
            last = e
        except (ImportError, AttributeError, KeyError, RuntimeError) as e:
            # find the reference module that failed and stub it out —
            # acceptable for everything except the llama path we test
            tb = e.__traceback__
            mod_file = None
            while tb is not None:
                f = tb.tb_frame.f_code.co_filename
                if f.startswith(REF):
                    mod_file = f
                tb = tb.tb_next
            if mod_file is None or "/definitions/" not in mod_file:
                last = e
                break
            rel = mod_file[len(REF) + 1 :].removesuffix(".py")
            mod_name = rel.replace("/", ".")
            if mod_name in sys.modules:
                last = e
                break
            sm = _StubModule(mod_name)
            sys.modules[mod_name] = sm
            last = e
    pytest.skip(
        "reference full pipeline not importable here: "
        f"{type(last).__name__}: {last}"
    )
