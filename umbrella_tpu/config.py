"""Model architecture configuration.

A minimal, HF-`config.json`-compatible description of the transformer families the
engine serves (Llama 2/3.x, Qwen2.5, Mistral, Gemma2) — the same architecture knobs the
reference reads off `transformers` configs (reference: `umbrella/models/llama.py:23-33`,
`qwen_layer.py:36-38`, `mistral.py:29`, `gemma.py:36-37`).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, List, Optional


@dataclasses.dataclass
class ModelConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None  # explicit override (Mistral-style); else hidden/heads
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # Qwen2.5: bias on q/k/v projections
    mlp_bias: bool = False
    hidden_act: str = "silu"
    eos_token_id: Any = 2
    bos_token_id: Any = 1
    rope_scaling: Optional[dict] = None  # HF llama3-style dict or None
    model_type: str = "llama"

    # MoE (Mixtral-style) extras — the reference is dense-MLP only (SURVEY §2);
    # these drive the TPU-native expert-parallel family (models/moe.py)
    num_local_experts: Optional[int] = None
    num_experts_per_tok: int = 2

    # Gemma2 extras (reference gemma.py:36-37,87-94,145-146)
    attn_logit_softcapping: Optional[float] = None
    final_logit_softcapping: Optional[float] = None
    query_pre_attn_scalar: Optional[float] = None
    sliding_window: Optional[int] = None

    # Quantization (populated when loading AWQ checkpoints)
    quantization: Optional[dict] = None  # {"method": "awq", "bits": 4, "group_size": 128}
    # Activation dtype for AWQ matmuls: "bf16" (W4A16, default) or "int8" (W4A8 —
    # int8 MXU at 2x rate; TPU extension, see ops/pallas/w4a8.py)
    awq_act: str = "bf16"

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def num_key_value_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def eos_token_ids(self) -> List[int]:
        eid = self.eos_token_id
        if eid is None:
            return []
        return list(eid) if isinstance(eid, (list, tuple)) else [int(eid)]

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in fields}
        quant_cfg = d.get("quantization_config")
        if quant_cfg and quant_cfg.get("quant_method") == "awq":
            known["quantization"] = {
                "method": "awq",
                "bits": quant_cfg.get("bits", 4),
                "group_size": quant_cfg.get("group_size", 128),
                "version": quant_cfg.get("version", "gemm"),
            }
        return cls(**known)

    @classmethod
    def from_pretrained(cls, model_name_or_path: str) -> "ModelConfig":
        """Load from a local checkpoint dir, HF cache, or the hub (if reachable)."""
        cfg_path = os.path.join(model_name_or_path, "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                return cls.from_dict(json.load(f))
        from transformers import AutoConfig  # resolves hub / local cache

        hf = AutoConfig.from_pretrained(model_name_or_path)
        return cls.from_dict(hf.to_dict())

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
