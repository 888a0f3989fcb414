"""CLIP model families: one assembly, four reference backbones.

Maps the reference's model zoo (SURVEY.md §2.3) onto the unified towers:

  family       vision layout            text tower                  ref loader
  ----------   ----------------------   -------------------------   -----------------------------------------
  biomedclip   timm ViT-B/16 (gelu)     PubMedBERT + MLP proj       open_clip hf-hub:microsoft/BiomedCLIP-*
  openai       OpenAI ViT-B/16 (qgelu)  CLIP text transformer       vendored clip.load("ckpt/ViT-B-16.pt")
  metaclip     OpenAI ViT-B/16 (qgelu)  CLIP text transformer       hf-hub:timm/vit_base_patch16_clip_224.metaclip_400m
  unimedclip   OpenAI ViT-B/16 (qgelu)  CLIP text transformer*      ckpt/unimed_clip_vit_b16.pt (visual only)

(*) the reference never loads UniMedCLIP text weights
(src/models/unimedclip/finetune.py:86-88); we keep that semantic — the text
tower exists but holds converted weights only if provided.

A model is (config, params). ``encode_image``/``encode_text`` are the public
entry points, mirroring the reference API (model.py:358-374).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .bert import BertConfig, bert_apply, bert_init
from .text_clip import TextConfig, text_apply, text_init
from .vit import VIT_B16_OPENAI, VIT_B16_TIMM, ViTConfig, vit_apply, vit_init

FAMILIES = ("biomedclip", "openai", "metaclip", "unimedclip")


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    family: str
    vision: ViTConfig
    text_kind: str                      # 'clip' | 'bert'
    text: TextConfig | BertConfig
    compute_dtype: str = "float32"      # 'bfloat16' for TPU hot paths

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def clip_config(family: str, *, compute_dtype: str = "float32",
                mona_variant: str = "hybrid", lora_alpha: float = 32.0,
                lora_dropout: float = 0.0) -> CLIPConfig:
    if family not in FAMILIES:
        raise ValueError(f"Unknown CLIP family {family!r}; choose from {FAMILIES}")
    if family == "biomedclip":
        vision = dataclasses.replace(VIT_B16_TIMM, mona_variant=mona_variant,
                                     lora_alpha=lora_alpha, lora_dropout=lora_dropout)
        return CLIPConfig(family, vision, "bert",
                          BertConfig(lora_alpha=lora_alpha, lora_dropout=lora_dropout),
                          compute_dtype=compute_dtype)
    vision = dataclasses.replace(VIT_B16_OPENAI, mona_variant=mona_variant,
                                 lora_alpha=lora_alpha, lora_dropout=lora_dropout)
    return CLIPConfig(family, vision, "clip", TextConfig(), compute_dtype=compute_dtype)


def clip_init(rng, cfg: CLIPConfig):
    kv, kt = jax.random.split(rng)
    text_init_fn = bert_init if cfg.text_kind == "bert" else text_init
    return {
        "visual": vit_init(kv, cfg.vision),
        "text": text_init_fn(kt, cfg.text),
        "logit_scale": jnp.asarray(jnp.log(1.0 / 0.07), jnp.float32),
    }


def infer_cfg(cfg: CLIPConfig, *, vision: bool = True,
              text: bool = True) -> CLIPConfig:
    """Forward-only variant of a CLIP config: every eligible tower block runs
    through the whole-block Pallas megakernel (ops/fused_block.py). Use ONLY
    on paths jax.grad never differentiates — eval/zero-shot/retrieval
    forwards and frozen in-step text towers: the megakernel's backward is a
    slow XLA recomposition (correct, but it defeats the composed backward
    kernels). ``vision=False``/``text=False`` keep that tower on the
    composed path (e.g. the train step's image tower, which IS
    differentiated, alongside its frozen in-step text tower)."""
    kw = {}
    if vision:
        kw["vision"] = dataclasses.replace(cfg.vision, block_impl="fused_infer")
    if text:
        kw["text"] = dataclasses.replace(cfg.text, block_impl="fused_infer")
    return dataclasses.replace(cfg, **kw)


def encode_image(params, cfg: CLIPConfig, images, *, rng=None, extract_layers=()):
    """images [B, H, W, 3] -> ([B, embed], activations)."""
    return vit_apply(params["visual"], cfg.vision, images,
                     dtype=cfg.dtype, rng=rng, extract_layers=extract_layers)


def encode_text(params, cfg: CLIPConfig, token_ids, *, attention_mask=None,
                rng=None):
    """rng: pass only in train mode (enables text-tower LoRA dropout under
    --tune_text_encoder; the CLIP text transformer never carries LoRA —
    reference injects vision-only, lora.py:202-248)."""
    if cfg.text_kind == "bert":
        return bert_apply(params["text"], cfg.text, token_ids,
                          attention_mask=attention_mask, dtype=cfg.dtype,
                          rng=rng)
    return text_apply(params["text"], cfg.text, token_ids, dtype=cfg.dtype)


def normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps))
