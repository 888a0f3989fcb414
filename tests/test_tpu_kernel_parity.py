"""Automated TPU-vs-CPU kernel numeric parity (VERDICT r2 Weak #2 / Next #3).

Every Pallas kernel's parity test runs in interpreter mode on CPU; this test
validates the REAL Mosaic lowering: it runs the same tiny CLI drives twice in
subprocesses — once on the axon TPU (kernels active), once on the forced-CPU
backend (interpreter/XLA paths) — with the same seed and float32 compute, and
asserts the resulting metrics agree. The method/driver matrix covers every
kernel gate: mona (flash, fused MLP, LN+QKV, attn+o, dwconv), the uncached
text path (post-norm BERT kernel suite), lora, full (pure-XLA gate), and the
zero-shot eval path.

Skipped when no TPU is reachable (CI/virtual-mesh runs). On success writes
KERNELPARITY_r{N}.json at the repo root for the round artifact trail.
"""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

pytestmark = [pytest.mark.tpu, pytest.mark.slow]


def _backend_in_subprocess(env):
    r = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.default_backend())"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    return r.stdout.strip().splitlines()[-1] if r.returncode == 0 else None


def _tpu_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # axon sitecustomize registers the TPU
    return env


def _cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def tpu_available():
    return _backend_in_subprocess(_tpu_env()) == "tpu"


_TPU_OK = None


def _require_tpu():
    global _TPU_OK
    if _TPU_OK is None:
        _TPU_OK = tpu_available()
    if not _TPU_OK:
        pytest.skip("no TPU backend reachable from a subprocess")


DRIVE = r"""
import json, sys
import jax
# the CPU leg must force the platform AFTER importing jax (env vars don't
# beat the axon sitecustomize); the TPU leg must NOT touch jax_platforms —
# the relay-registered platform is what default_backend()=='tpu' resolves to
if "{platform}" == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
sys.path.insert(0, {repo!r}); sys.path.insert(0, {tests!r})
from synth_data import make_finetune_csv, make_synth_root
import os
os.chdir({work!r})
out = None
{body}
print("PARITY_RESULT " + json.dumps(out))
"""

FT_BODY = """
csv, img_dir = make_finetune_csv("{work}/ft", n=24, img_size=32)
from nextgen_uia_tpu.tasks.biomedclip.finetune import main
out = main(["--exp", "kp_{tag}_{platform}", "--method", "{method}",
            "--epochs", "1", "--patience", "5", "--seed", "7",
            "--finetune_csvs", csv, "--finetune_img_dirs", img_dir,
            "--img_size", "64", "--batch_size", "8", "--debug_tiny",
            "--num_workers", "2", "--compute_dtype", "float32",
            "--accumulation_steps", "2"] + {extra})
"""

ZS_BODY = """
root, name, _ = make_synth_root("{work}/data", dataset="BUSI", n=12, img_size=64)
from nextgen_uia_tpu.tasks.biomedclip.zero_shot import main
out = main(["--dataset", "BUSI", "--data_root", str(root), "--exp",
            "kp_{tag}_{platform}", "--img_size", "64", "--batch_size", "4",
            "--debug_tiny", "--num_workers", "2",
            "--compute_dtype", "float32"])
"""

SUP_BODY = """
root, name, _ = make_synth_root("{work}/data", dataset="BUSI", n=12, img_size=64)
from nextgen_uia_tpu.tasks.clip.classification import main
out = main(["--dataset", "BUSI", "--data_root", str(root), "--exp",
            "kp_{tag}_{platform}", "--img_size", "64", "--batch_size", "4",
            "--epochs", "2", "--val_interval", "2", "--patience", "3",
            "--seed", "7", "--debug_tiny", "--num_workers", "2",
            "--compute_dtype", "float32",
            "--strong_augs", "--weak_augs"])
"""

SUPSEG_BODY = """
root, name, _ = make_synth_root("{work}/data", dataset="BUSI", n=12, img_size=64)
from nextgen_uia_tpu.tasks.clip.segmentation import main
out = main(["--dataset", "BUSI", "--data_root", str(root), "--exp",
            "kp_{tag}_{platform}", "--img_size", "64", "--batch_size", "4",
            "--epochs", "2", "--val_interval", "2", "--patience", "3",
            "--seed", "7", "--debug_tiny", "--num_workers", "2",
            "--compute_dtype", "float32",
            "--strong_augs", "--weak_augs"])
"""

LONGSEQ_BODY = """
import jax.numpy as jnp
from nextgen_uia_tpu.ops.flash_attention import flash_attention
ks = jax.random.split(jax.random.key(0), 4)
q = jax.random.normal(ks[0], (1, 1370, 4, 64), jnp.float32)
k = jax.random.normal(ks[1], (1, 1370, 4, 64), jnp.float32)
v = jax.random.normal(ks[2], (1, 1370, 4, 64), jnp.float32)
o = flash_attention(q, k, v)
g = jax.grad(lambda a, b, c: jnp.sum(flash_attention(a, b, c) ** 2),
             argnums=(0, 1, 2))(q, k, v)
# fixed random projections: elementwise errors cannot hide in means
w = jax.random.normal(ks[3], o.shape, jnp.float32)
out = {{"o_proj": float(jnp.vdot(o, w) / o.size),
       "o_absmax": float(jnp.max(jnp.abs(o))),
       "dq_proj": float(jnp.vdot(g[0], w) / o.size),
       "dk_proj": float(jnp.vdot(g[1], w) / o.size),
       "dv_proj": float(jnp.vdot(g[2], w) / o.size)}}
"""

DINO_BODY = """
root, name, _ = make_synth_root("{work}/data", dataset="BUSI", n=12, img_size=64)
from nextgen_uia_tpu.tasks.dino.segmentation import main
out = main(["--dataset", "BUSI", "--data_root", str(root), "--exp",
            "kp_{tag}_{platform}", "--img_size", "518", "--batch_size", "4",
            "--epochs", "2", "--val_interval", "2", "--patience", "3",
            "--seed", "7", "--debug_tiny", "--num_workers", "2",
            "--compute_dtype", "float32", "--decoder_type", "unet",
            "--strong_augs", "--weak_augs"])
"""

CASES = {
    # the long-N flash regime (DINOv2 @ 518 px = 1370 tokens, one head per
    # grid cell, raised scoped-vmem ceiling): real Mosaic lowering vs the
    # CPU interpreter, forward + all three input grads
    "flash_longseq": (LONGSEQ_BODY, dict()),
    # the dino-family END-TO-END composition at the real 518-px geometry
    # (VERDICT r4 Next #7): tiny frozen encoder @1370 tokens (long-N flash
    # on TPU) + 518-px on-device augs + UNet decoder (BN state, conv2d_cat,
    # align_corners resizes) + DiceCE train metrics — the full dino-seg
    # train/val/test drive on real Mosaic vs the CPU paths
    "dino_seg_518": (DINO_BODY, dict()),
    "mona_uncached_text": (FT_BODY, dict(
        method="mona", extra=["--mona_variant", "hybrid",
                              "--no-cache_text_features"])),
    "mona_cached": (FT_BODY, dict(method="mona",
                                  extra=["--mona_variant", "hybrid"])),
    "lora": (FT_BODY, dict(method="lora", extra=[])),
    "full": (FT_BODY, dict(method="full", extra=[])),
    "zero_shot": (ZS_BODY, dict()),
    # drives the full on-device augmentation chain (equalize/posterize/
    # rotate/... compare-reduce forms) through a training run on BOTH
    # backends with the same threefry stream — the durable CPU-vs-TPU aug
    # parity check (reference aug law: src/datasets/classification.py:123-151)
    "supervised_augs": (SUP_BODY, dict()),
    # the PyramidHead SEG tail (conv-before-resize, round 5) + DiceCE +
    # seg metrics on real Mosaic vs CPU — the cls case above never touches
    # the seg head, and the seg head carries the round-5 exact reordering
    "supervised_seg": (SUPSEG_BODY, dict()),
}


def _run_case(tag, platform, tmp):
    body_t, kw = CASES[tag]
    work = str(tmp / f"{tag}_{platform}")
    os.makedirs(work, exist_ok=True)
    body = body_t.format(work=work, tag=tag, platform=platform,
                         method=kw.get("method", ""),
                         extra=kw.get("extra", []))
    script = DRIVE.format(platform=platform, repo=str(REPO),
                          tests=str(REPO / "tests"), work=work, body=body)
    env = _tpu_env() if platform == "tpu" else _cpu_env()
    # axon registers only from the repo cwd; the script chdirs to `work`
    # AFTER importing jax
    r = subprocess.run([sys.executable, "-c", script], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, f"{tag}/{platform} failed:\n{r.stdout[-2000:]}\n{r.stderr[-3000:]}"
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("PARITY_RESULT ")]
    assert line, f"no result line in {tag}/{platform} output"
    return json.loads(line[-1][len("PARITY_RESULT "):])


RESULTS = {}


@pytest.mark.parametrize("tag", sorted(CASES))
def test_kernel_parity(tag, tmp_path_factory):
    _require_tpu()
    tmp = tmp_path_factory.mktemp("kparity")
    tpu = _run_case(tag, "tpu", tmp)
    cpu = _run_case(tag, "cpu", tmp)
    keys = sorted(k for k in tpu if isinstance(tpu[k], (int, float))
                  and k in cpu and np.isfinite(tpu[k]))
    assert keys, f"no comparable metrics for {tag}: {tpu} vs {cpu}"
    report = {}
    for k in keys:
        a, b = float(tpu[k]), float(cpu[k])
        report[k] = {"tpu": a, "cpu": b, "absdiff": abs(a - b)}
        # f32 everywhere; Mosaic vs XLA differ only in reduction/tile order.
        # Surface-distance metrics (HD95/ASD) are DISCRETE boundary geometry
        # on thresholded logits: one pixel flipping at the decision boundary
        # (legitimate f32 reduction-order noise through a 1370-token
        # encoder + decoder) steps them discontinuously, so they get a
        # coarser bound than the continuous metrics (loss/dice/iou/acc...,
        # which must and do agree to 2e-4).
        loose = ("hd95" in k) or ("asd" in k)
        tol = 5e-2 if loose else 2e-4
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol,
                                   err_msg=f"{tag}:{k} tpu={a} cpu={b}")
    RESULTS[tag] = report


def test_write_artifact():
    _require_tpu()
    assert RESULTS, "no parity cases ran"
    art = {"cases": RESULTS, "note":
           "same seed, float32, tiny towers; tpu = real Mosaic kernels, "
           "cpu = interpreter/XLA paths (tests/test_tpu_kernel_parity.py)"}
    (REPO / "KERNELPARITY_r05.json").write_text(json.dumps(art, indent=1))
