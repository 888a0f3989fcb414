"""Unified Vision Transformer for all CLIP families.

One implementation covers the three reference layouts (checkpoint converters
absorb the naming differences — cf. SURVEY.md §7 "layout quirks live in the
converter, not the model"):

  - OpenAI CLIP / MetaCLIP visual tower: conv patch embed (no bias), class
    embedding, ln_pre, quick-gelu blocks, ln_post on CLS, matrix proj
    (/root/reference/src/third_party/openai_clip/model.py:216-258).
  - timm/BiomedCLIP trunk: conv patch embed (bias), cls token, pos embed, no
    ln_pre, gelu blocks, final norm over all tokens, linear head proj
    (/root/reference/src/third_party/timm/clip_adapter.py:77-116).

Adapter slots are declarative: a block applies MONA iff its param dict has a
'mona' key; attention applies LoRA iff its subtree has a 'lora' key. There is
no sequence-first/batch-first split — everything is [B, N, D] (the reference's
permute dance, mona.py:38-67, is a torch layout artefact with no TPU analogue).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


def _call_remat(fn, blk, x, cfg, *, dtype=None, rng=None):
    return fn(blk, x, cfg, dtype, rng)


def _call_remat_pad(fn, blk, x, cfg, *, dtype=None, rng=None, key_bias=None, n_real=None):
    return fn(blk, x, cfg, dtype, rng, key_bias, n_real)

from ..adapters.mona import mona_apply
from ..nn.attention import attention_init, mha
from ..nn.layers import (conv_init, ACTIVATIONS, layernorm, layernorm_init,
                         linear, linear_init)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    act: str = "gelu"              # 'gelu' (timm/BiomedCLIP) | 'quick_gelu' (OpenAI/UniMedCLIP)
    ffn: str = "mlp"               # 'mlp' | 'swiglufused' (DINOv2 giant2 —
                                   # dino/layers/swiglu_ffn.py:45-63)
    use_ln_pre: bool = False        # True for OpenAI/MetaCLIP layout
    patch_bias: bool = True         # False for OpenAI/MetaCLIP conv1
    final_norm: str = "all"         # 'all' (timm) | 'cls' (OpenAI ln_post on CLS only)
    proj_dim: int | None = 512      # output embed dim; None = no projection
    proj_bias: bool = False         # timm head has no bias either (open_clip proj='linear')
    ln_eps: float = 1e-5            # timm uses 1e-6
    # adapter config (static; params decide presence per block)
    mona_variant: str = "hybrid"
    lora_alpha: float = 32.0
    # dropout on the LoRA-branch input in train mode (reference
    # LinearLoRA.forward, lora.py:73-90; plumbed from --lora_dropout).
    # Train/eval gating = rng presence, like MONA dropout.
    lora_dropout: float = 0.0
    # rematerialize each block in backward. On bandwidth-starved parts this
    # is a large WIN: recompute (cheap, MXU underutilized) replaces HBM
    # round-trips of per-block activations (scarce at ~89 GB/s on this chip).
    remat: bool = False
    # MLP execution: 'auto' = fused Pallas kernel on TPU (frozen weights —
    # adapter finetuning), 'xla' = plain ops (required for full fine-tuning,
    # where MLP weight grads are needed; see ops/fused_mlp.py)
    mlp_impl: str = "auto"
    # pad the token sequence once at embed time to a multiple of this (197 ->
    # 208), masking padded keys via attention bias. 16 matches the flash
    # kernel's bf16 sublane tile, so the kernel needs NO internal pad copies
    # (profiled at 2.7 ms/step for the 200->208 re-pads). 1 disables.
    token_pad: int = 16
    # 'fused_infer' runs each eligible block through the whole-block Pallas
    # megakernel (ops/fused_block.py — FORWARD-ONLY contract: its backward is
    # a slow XLA recomposition). Set ONLY on forward-only paths: eval/
    # zero-shot/retrieval drivers (models.clip.infer_cfg) and frozen towers
    # whose output jax.grad never differentiates. 'auto' = composed kernels.
    block_impl: str = "auto"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


def vit_init(rng, cfg: ViTConfig):
    ks = jax.random.split(rng, cfg.depth + 5)
    scale = cfg.width ** -0.5
    p = {
        "patch": conv_init(ks[0], cfg.patch_size, cfg.patch_size, 3, cfg.width, bias=cfg.patch_bias),
        "cls": jax.random.normal(ks[1], (cfg.width,), jnp.float32) * scale,
        "pos": jax.random.normal(ks[2], (cfg.seq_len, cfg.width), jnp.float32) * scale,
        "blocks": [_block_init(ks[3 + i], cfg) for i in range(cfg.depth)],
        "norm": layernorm_init(cfg.width),
    }
    if cfg.use_ln_pre:
        p["ln_pre"] = layernorm_init(cfg.width)
    if cfg.proj_dim is not None:
        p["proj"] = linear_init(ks[-1], cfg.width, cfg.proj_dim, bias=cfg.proj_bias, std=scale)
    return p


def _block_init(rng, cfg: ViTConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    hidden = int(cfg.width * cfg.mlp_ratio)
    if cfg.ffn == "swiglufused":
        # SwiGLUFFNFused: hidden = round8(2/3 * 4d); w12 packs both gates
        # (dino/layers/swiglu_ffn.py:26-33,57)
        hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
        mlp = {
            "w12": linear_init(k2, cfg.width, 2 * hidden),
            "w3": linear_init(k3, hidden, cfg.width),
        }
    else:
        mlp = {
            "fc1": linear_init(k2, cfg.width, hidden),
            "fc2": linear_init(k3, hidden, cfg.width),
        }
    return {
        "ln1": layernorm_init(cfg.width),
        "attn": attention_init(k1, cfg.width),
        "ln2": layernorm_init(cfg.width),
        "mlp": mlp,
    }


def run_mlp(mlp_p, h_in, act: str, impl: str, *, dtype=None):
    """fc1 -> act -> fc2 (or SwiGLU: silu(x1)*x2 -> w3 when the param subtree
    carries 'w12'/'w3'), via the fused Pallas kernel when eligible."""
    if "w12" in mlp_p:
        x12 = linear(mlp_p["w12"], h_in, dtype=dtype)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return linear(mlp_p["w3"], jax.nn.silu(x1) * x2, dtype=dtype)
    use_fused = (impl == "fused" or (impl == "auto" and jax.default_backend() == "tpu"))
    if use_fused:
        from ..ops.fused_mlp import fused_mlp

        x = h_in if dtype is None else h_in.astype(dtype)
        return fused_mlp(x, mlp_p["fc1"]["w"], mlp_p["fc1"]["b"],
                         mlp_p["fc2"]["w"], mlp_p["fc2"]["b"], act=act)
    act_fn = ACTIVATIONS[act]
    h = linear(mlp_p["fc1"], h_in, dtype=dtype)
    return linear(mlp_p["fc2"], act_fn(h), dtype=dtype)


def block_apply(p, x, cfg: ViTConfig, *, dtype=None, rng=None,
                key_bias=None, n_real: int | None = None):
    """Pre-norm transformer block; MONA slot applied after the residual MLP
    (matching the reference's post-block injection, mona.py:667-676).

    key_bias/n_real support once-padded token sequences: padded keys are
    masked in attention, and MONA operates on the real prefix only.
    """
    if (cfg.block_impl == "fused_infer" and cfg.mlp_impl == "auto"
            and "ls1" not in p and "ls2" not in p):
        # forward-only whole-block megakernel (ops/fused_block.py) — eval /
        # frozen-tower paths only; falls through when ineligible
        from ..ops.fused_block import fused_block_infer, fused_block_should_run

        if fused_block_should_run():
            xx = x if dtype is None else x.astype(dtype)
            out = fused_block_infer(xx, p, heads=cfg.heads, act=cfg.act,
                                    eps=cfg.ln_eps, key_bias=key_bias,
                                    n_real=n_real)
            if out is not None:
                if "mona" in p:
                    mona_rng = None
                    if rng is not None:
                        rng, mona_rng = jax.random.split(rng)
                    out = mona_apply(p["mona"], out, (cfg.grid, cfg.grid),
                                     variant=cfg.mona_variant, rng=mona_rng)
                return out
    lora_rng = None
    if (rng is not None and cfg.lora_dropout > 0.0 and "lora" in p["attn"]):
        rng, lora_rng = jax.random.split(rng)
    if cfg.mlp_impl == "auto":
        # frozen tower: hand mha the raw x + ln1 (+ the residual, when no
        # LayerScale sits between branch and skip) so the TPU path can fuse
        # LN into the q/k/v projections (ops/fused_ln_qkv.py) and the
        # o-projection + residual add into the attention kernel
        # (ops/fused_attn_o.py); mha falls back op-by-op when ineligible.
        if "ls1" in p:  # DINOv2 LayerScale (dino/layers/layer_scale.py)
            a = mha(p["attn"], x, num_heads=cfg.heads, dtype=dtype,
                    lora_alpha=cfg.lora_alpha, key_padding_bias=key_bias,
                    lora_dropout=cfg.lora_dropout, lora_rng=lora_rng,
                    ln=p["ln1"], ln_eps=cfg.ln_eps)
            x = x + a * p["ls1"].astype(a.dtype)
        else:
            x = mha(p["attn"], x, num_heads=cfg.heads, dtype=dtype,
                    lora_alpha=cfg.lora_alpha, key_padding_bias=key_bias,
                    lora_dropout=cfg.lora_dropout, lora_rng=lora_rng,
                    ln=p["ln1"], ln_eps=cfg.ln_eps, residual=x)
    else:
        # full fine-tuning differentiates LN weights — keep LN in XLA
        a = mha(p["attn"], layernorm(p["ln1"], x, eps=cfg.ln_eps),
                num_heads=cfg.heads, dtype=dtype, lora_alpha=cfg.lora_alpha,
                lora_dropout=cfg.lora_dropout, lora_rng=lora_rng,
                key_padding_bias=key_bias)
        if "ls1" in p:
            a = a * p["ls1"].astype(a.dtype)
        x = x + a
    use_fused_ln_mlp = (cfg.mlp_impl == "auto" and "ls2" not in p
                        and "w12" not in p["mlp"]
                        and jax.default_backend() == "tpu")
    if use_fused_ln_mlp:
        from ..ops.fused_ln_mlp import fused_ln_mlp_residual

        xx = x if dtype is None else x.astype(dtype)
        fused = fused_ln_mlp_residual(xx, p["ln2"], p["mlp"], act=cfg.act,
                                      eps=cfg.ln_eps)
        if fused is not None:
            x = fused
        else:
            use_fused_ln_mlp = False
    if not use_fused_ln_mlp:
        m = run_mlp(p["mlp"], layernorm(p["ln2"], x, eps=cfg.ln_eps), cfg.act,
                    cfg.mlp_impl, dtype=dtype)
        if "ls2" in p:
            m = m * p["ls2"].astype(m.dtype)
        x = x + m
    if "mona" in p:
        mona_rng = None
        if rng is not None:
            rng, mona_rng = jax.random.split(rng)
        # padded tail rows ride the CLS (channel-only) path inside
        # mona_apply — no per-block slice/concat back to the real length
        x = mona_apply(p["mona"], x, (cfg.grid, cfg.grid),
                       variant=cfg.mona_variant, rng=mona_rng)
    return x


def embed_patches(p, cfg: ViTConfig, images, *, dtype=None):
    """images [B, H, W, 3] -> tokens [B, N, D] with CLS + positional embedding."""
    w = p["patch"]["w"]
    if dtype is not None:
        images = images.astype(dtype)
        w = w.astype(dtype)
    x = jax.lax.conv_general_dilated(
        images, w, (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p["patch"]:
        x = x + p["patch"]["b"].astype(x.dtype)
    b = x.shape[0]
    x = x.reshape(b, cfg.grid * cfg.grid, cfg.width)
    cls_tok = jnp.broadcast_to(p["cls"].astype(x.dtype), (b, 1, cfg.width))
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + p["pos"].astype(x.dtype)
    if cfg.use_ln_pre:
        x = layernorm(p["ln_pre"], x, eps=cfg.ln_eps)
    return x


def vit_apply(p, cfg: ViTConfig, images, *, dtype=None, rng=None, extract_layers=()):
    """Run the tower. Returns (pooled_embedding, activations) where
    ``activations`` collects post-block token states for layer indices in
    ``extract_layers`` (the pyramid head's taps {3,6,9} — clip_adapter.py:104-107).
    """
    x = embed_patches(p, cfg, images, dtype=dtype)
    n_real = x.shape[1]
    key_bias = None
    if cfg.token_pad > 1 and n_real % cfg.token_pad:
        n_pad = ((n_real + cfg.token_pad - 1) // cfg.token_pad) * cfg.token_pad
        x = jnp.pad(x, ((0, 0), (0, n_pad - n_real), (0, 0)))
        key_bias = jnp.full((x.shape[0], n_pad), 0.0, jnp.float32)
        key_bias = key_bias.at[:, n_real:].set(-1e9)
    activations = []
    run_block = block_apply
    if cfg.remat:
        run_block = jax.checkpoint(
            lambda blk, x, cfg, dtype, rng, key_bias, n_real: block_apply(
                blk, x, cfg, dtype=dtype, rng=rng, key_bias=key_bias, n_real=n_real),
            static_argnums=(2, 3, 6))
        run_block = functools.partial(_call_remat_pad, run_block)
    for i, blk in enumerate(p["blocks"]):
        blk_rng = None
        if rng is not None:
            rng, blk_rng = jax.random.split(rng)
        x = run_block(blk, x, cfg, dtype=dtype, rng=blk_rng,
                      key_bias=key_bias, n_real=n_real)
        if i in extract_layers:
            activations.append(x[:, :n_real])
    x = x[:, :n_real]

    if cfg.final_norm == "all":
        x = layernorm(p["norm"], x, eps=cfg.ln_eps)
        pooled = x[:, 0, :]
    else:  # 'cls': OpenAI ln_post on the CLS token only (model.py:252)
        pooled = layernorm(p["norm"], x[:, 0, :], eps=cfg.ln_eps)

    if "proj" in p:
        pooled = linear(p["proj"], pooled, dtype=pooled.dtype)
    return pooled, activations


# Reference tower configurations ------------------------------------------------

VIT_B16_TIMM = ViTConfig(act="gelu", use_ln_pre=False, patch_bias=True,
                         final_norm="all", proj_dim=512, ln_eps=1e-6)
VIT_B16_OPENAI = ViTConfig(act="quick_gelu", use_ln_pre=True, patch_bias=False,
                           final_norm="cls", proj_dim=512, ln_eps=1e-5)
