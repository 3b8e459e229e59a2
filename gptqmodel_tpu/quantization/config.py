"""Quantization config system.

TPU-native re-design of the reference's config family
(gptqmodel/quantization/config.py:2436-4285): one dataclass with a ``method``
dispatcher instead of a metaclass zoo, the same on-disk ``quantize_config.json``
schema (bits / group_size / desc_act / sym / checkpoint_format / ...) so
checkpoints interoperate, and the same ``dynamic`` per-module override regex
semantics (``+:`` match-and-override, ``-:`` exclude; reference
config ``dynamic_get``).
"""

from __future__ import annotations

import json
import re
from dataclasses import asdict, dataclass, field
from enum import Enum
from pathlib import Path
from typing import Any, Optional


class METHOD(str, Enum):
    GPTQ = "gptq"
    AWQ = "awq"
    RTN = "rtn"
    FP8 = "fp8"
    QQQ = "qqq"  # W4A8: sym 4-bit weights + dynamic int8 activations
    FP4 = "fp4"  # e2m1 weight-only with per-group scales
    BITSANDBYTES = "bitsandbytes"  # nf4 weight-only (reference METHOD.BITSANDBYTES)
    PAROQUANT = "paroquant"  # learned pairwise-rotation quantization
    EXL3 = "exl3"  # QTIP-style trellis quantization (reference EXL3Config)

    def __str__(self) -> str:  # serialize as plain string
        return self.value


class FORMAT(str, Enum):
    GPTQ = "gptq"  # v1 on-disk: qzeros stored with -1 offset
    GPTQ_V2 = "gptq_v2"  # runtime format: true zeros
    GPTQ_P = "gptq_p"  # split-plane packing (native 5/6/7-bit), v2 zeros
    AWQ_GEMM = "gemm"
    AWQ_GEMV = "gemv"  # reference gemv_awq.py layout (import-only)
    AWQ_GEMV_FAST = "gemv_fast"  # reference gemv_fast_awq.py layout (import-only)
    EXL3 = "exl3"  # trellis-packed (exllamav3 tensor layout)

    def __str__(self) -> str:
        return self.value


QUANT_CONFIG_FILENAME = "quantize_config.json"

# keys we understand from reference checkpoints (compat map,
# reference config.py:61-103)
_COMPAT_KEYS = {
    "checkpoint_format": "format",
    "quant_method": "method",
    "version": "quantizer_version",
}


@dataclass
class QuantizeConfig:
    bits: int = 4
    group_size: int = 128
    desc_act: bool = False
    sym: bool = True
    method: METHOD = METHOD.GPTQ
    format: FORMAT = FORMAT.GPTQ
    true_sequential: bool = True
    lm_head: bool = False
    mse: float = 0.0  # >0 enables MSE grid search (reference uses 2.4 norm)
    damp_percent: float = 0.01
    damp_auto_increment: float = 0.0025
    static_groups: bool = False
    act_group_aware: bool = False  # GAR reordering (reference gar.py)
    mock_quantization: bool = False  # skip Hessian/Cholesky — fast lifecycle tests
    pack_dtype: str = "int32"
    # per-module override regexes: {"+:expr" | "expr": {field: value}, "-:expr": None}
    dynamic: Optional[dict[str, Optional[dict[str, Any]]]] = None
    # adapter generation: {"name": "eora", "rank": N} (reference adapter=Lora(...))
    adapter: Optional[dict[str, Any]] = None
    # QuaRot-style orthogonal rotation pre-quant: "hadamard" | "random" |
    # "online" (runtime blockwise-Hadamard on down-proj activations, the
    # reference set_had_K analog) | "hadamard+online" | "random+online"
    rotation: Optional[str] = None
    # GPTAQ (GPTQ v2) asymmetric-error correction: {"alpha": 0.25}; needs a
    # parallel native-activation stream (reference config.py:1231, gptaq.py)
    gptaq: Optional[dict[str, Any]] = None
    # FOEM first-order error compensation: {"alpha": 0.0, "beta": 0.2}
    # (reference FOEMConfig config.py:1246; α=0,β=0 ≡ GPTQ, α>0 adds the
    # GPTAQ P-term and needs the native stream)
    foem: Optional[dict[str, Any]] = None
    # ParoQuant options: {"rounds": 4, "rot_group": 128, "steps": 64,
    # "lr": 5e-3} (reference ParoConfig config.py:3346)
    paroquant: Optional[dict[str, Any]] = None
    # EXL3 trellis options (reference EXL3Config config.py:3780): procedural
    # codebook, lm_head bit override, output-channel-scale policy
    codebook: str = "mcg"  # "mcg" | "mul1" | "3inst"
    head_bits: Optional[int] = None
    out_scales: Optional[str] = "auto"  # "always" | "never" | "auto"
    # TP padder preprocessor (reference TensorParallelPadderConfig
    # config.py:1185, applied in gptq.py:208-221,1318-1343): solve with
    # in-features zero-padded to lcm(8, group_size) so group boundaries stay
    # aligned for downstream tensor-parallel sharding, truncate after
    tp_pad: bool = False
    # failsafe: modules with fewer calibration samples than this fall back to RTN
    fallback_min_samples: int = 1
    # weight smoothing applied on the failsafe path before RTN:
    # name from smooth.SMOOTH_METHODS (or legacy "rms_row") or a
    # {"type": ..., **params} dict (reference SmoothMethods config.py:882-1046)
    fallback_smooth: Optional[Any] = None
    # model-wide pre-quant Smoother preprocessor (reference SmootherConfig
    # config.py:1127 + looper/module_preprocessor.py): same method spec as
    # fallback_smooth, applied to EVERY module's weights before the solve.
    # Gated off when group_size < smooth_group_threshold (reference
    # SmoothMethod.group_size_threshold, config.py:886).
    smooth: Optional[Any] = None
    smooth_group_threshold: int = 128
    # mid-quant durability: directory for the per-layer journal (reference
    # incremental offload stage_layer.py:726-760 / writer.py:399 split_by);
    # a killed quantization resumes from the last persisted layer
    journal: Optional[str] = None
    # host pack / journal-write worker threads overlapping the TPU solve+
    # replay (reference finalize/offload future drain, stage_layer.py:714-940);
    # 0 = pack inline
    pack_workers: int = 2
    device: Optional[str] = None
    meta: dict = field(default_factory=dict)

    def __post_init__(self):
        self.method = METHOD(self.method)
        self.format = FORMAT(self.format)
        if self.method not in (METHOD.FP8, METHOD.FP4, METHOD.EXL3) and self.bits not in (2, 3, 4, 5, 6, 7, 8):
            raise ValueError(f"unsupported bits: {self.bits}")
        if self.method == METHOD.QQQ:
            # QQQ is W4A8: 4-bit symmetric weights (reference qqq.py:186)
            if self.bits != 4:
                raise ValueError("QQQ requires bits=4 (W4A8)")
            self.sym = True
        if self.bits in (5, 6, 7) and self.format in (FORMAT.GPTQ, FORMAT.GPTQ_V2):
            # 5/6/7-bit have no continuous layout: auto-route to planar
            # (reference docs/gptq_planar.md "auto-route" semantics)
            self.format = FORMAT.GPTQ_P
        if self.method == METHOD.FP8:
            self.bits = 8  # nominal; e4m3 storage
        if self.method == METHOD.FP4:
            self.bits = 4  # nominal; e2m1 storage
        if self.method == METHOD.BITSANDBYTES:
            self.bits = 4  # nf4 storage (reference _normalize_bitsandbytes_format)
        if self.method == METHOD.EXL3:
            # trellis: K in 1..8 bits, no groups, sym-free codebook
            # (reference EXL3Config.__post_init__: group_size=-1, sym=True)
            if not (1 <= int(self.bits) <= 8):
                raise ValueError(f"EXL3 bits must be 1..8, got {self.bits}")
            self.bits = int(self.bits)
            self.format = FORMAT.EXL3
            self.group_size = -1
            self.desc_act = False
            self.sym = True
            self.codebook = str(self.codebook).strip().lower()
            if self.codebook not in ("mcg", "mul1", "3inst"):
                raise ValueError(f"EXL3 codebook must be mcg|mul1|3inst: {self.codebook}")
            aliases = {"always": "always", "true": "always", "never": "never",
                       "false": "never", "auto": "auto", "none": "auto", None: "auto"}
            key = self.out_scales if self.out_scales is None else str(self.out_scales).lower()
            if key not in aliases:
                raise ValueError(f"EXL3 out_scales must be always|never|auto: {self.out_scales}")
            self.out_scales = aliases[key]
        if self.rotation is not None and self.rotation not in (
            "hadamard", "random", "online", "hadamard+online", "random+online"
        ):
            raise ValueError(f"unknown rotation mode: {self.rotation}")
        if self.group_size not in (-1,) and self.group_size <= 0:
            raise ValueError(f"invalid group_size: {self.group_size}")
        # NOTE: AWQ-method checkpoints are saved in the GPTQ pack layout
        # (scales folded into the producing modules); FORMAT.AWQ_GEMM is for
        # importing external AWQ-format checkpoints.

    # ---------------------------------------------------------------- dynamic
    def dynamic_get(self, module_name: str, key: str | None = None, default=None):
        """Resolve per-module overrides.

        Returns False if the module is excluded (``-:`` rule), the override
        value for ``key`` if a ``+:``/plain rule matches, else ``default``.
        Mirrors reference ``QuantizeConfig.dynamic_get`` semantics.
        """
        if not self.dynamic:
            return default if key else None
        for pattern, overrides in self.dynamic.items():
            neg = pattern.startswith("-:")
            expr = pattern[2:] if pattern[:2] in ("+:", "-:") else pattern
            if re.match(expr, module_name):
                if neg:
                    return False
                if key is None:
                    return overrides
                if overrides and key in overrides:
                    return overrides[key]
                return default
        return default if key else None

    def for_module(self, module_name: str) -> "QuantizeConfig | None":
        """Clone with dynamic overrides applied; None if module excluded."""
        if not self.dynamic:
            return self
        probe = self.dynamic_get(module_name, key="bits", default=self.bits)
        if probe is False:
            return None
        overrides = self.dynamic_get(module_name) or {}
        if not overrides:
            return self
        d = self.to_dict()
        d.pop("checkpoint_format", None)
        d.pop("quant_method", None)
        clone = QuantizeConfig(
            **{**{k: getattr(self, k) for k in self.__dataclass_fields__}, **overrides}
        )
        clone.dynamic = None
        return clone

    @property
    def maxq(self) -> int:
        return 2**self.bits - 1

    def bits_per_weight(self) -> float:
        g = self.group_size if self.group_size > 0 else 4096
        # codes + fp16 scale/group + packed zeros/group
        return self.bits + (16 + self.bits) / g

    # ------------------------------------------------------------- serialize
    def to_dict(self) -> dict:
        d = asdict(self)
        d["quant_method"] = str(self.method)
        d["checkpoint_format"] = str(self.format)
        d.pop("method")
        d.pop("format")
        d.pop("mock_quantization", None)
        d.pop("device", None)
        if self.method != METHOD.EXL3:  # exl3-only keys (reference payload)
            d.pop("codebook", None)
            d.pop("head_bits", None)
            d.pop("out_scales", None)
        return d

    def save_pretrained(self, save_dir: str | Path):
        path = Path(save_dir) / QUANT_CONFIG_FILENAME
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def from_dict(cls, d: dict) -> "QuantizeConfig":
        d = dict(d)
        # AutoAWQ checkpoint schema (quant_method=awq, version=gemm,
        # w_bit/q_group_size/zero_point)
        if d.get("quant_method") == "awq" and d.get("version") in (
            "gemm", "gemv", "gemv_fast",
        ):
            d["format"] = FORMAT(d.pop("version"))
            if "w_bit" in d:
                d["bits"] = d.pop("w_bit")
            if "q_group_size" in d:
                d["group_size"] = d.pop("q_group_size")
            if "zero_point" in d:
                d["sym"] = not d.pop("zero_point")
        for src, dst in _COMPAT_KEYS.items():
            if src in d:
                val = d.pop(src)
                if dst == "quantizer_version":
                    d.setdefault("meta", {})["quantizer_version"] = val
                else:
                    d[dst] = val
        known = set(cls.__dataclass_fields__)
        extra = {k: v for k, v in d.items() if k not in known}
        d = {k: v for k, v in d.items() if k in known}
        cfg = cls(**d)
        if extra:
            cfg.meta.setdefault("extra", {}).update(extra)
        return cfg

    @classmethod
    def from_pretrained(cls, model_dir: str | Path) -> "QuantizeConfig":
        model_dir = Path(model_dir)
        qc = model_dir / QUANT_CONFIG_FILENAME
        if qc.exists():
            return cls.from_dict(json.loads(qc.read_text()))
        # fall back to HF config.json quantization_config
        hf = model_dir / "config.json"
        if hf.exists():
            cfg = json.loads(hf.read_text())
            if "quantization_config" in cfg:
                return cls.from_dict(cfg["quantization_config"])
        raise FileNotFoundError(f"no quantize_config.json in {model_dir}")
