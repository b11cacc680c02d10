"""Torch-FOCUS checkpoint importer round-trip tests (VERDICT r1 item 5).

Loads the reference model modules (/root/reference/model/*.py) in-process,
builds small-scale torch modules, converts their state_dicts with
tools/focus_import.convert_focus_state_dict, and asserts our flax modules
produce the same outputs with the imported weights:

  * Backbone: full forward parity (the reference backbone is runnable as-is).
  * TransformerEncoderBlock: parity against the REPAIRED reference forward —
    the reference module's own forward feeds batch-first tensors to a
    seq-first nn.MultiheadAttention (bug B2), so the oracle runs the same
    weights through the intended batch-first computation.
  * Head: raw-map parity in train mode (eval decode depends on the zeroed
    reference strides, bug B4).
  * Full BaseModel state_dict: everything converts except the documented
    no-counterpart tensors (DFL arange conv, BN counters).
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")  # tools/ is not a package
from tools.focus_import import convert_focus_state_dict  # noqa: E402
from transparent_object_detection_tpu.train.checkpoints import load_weights_partial  # noqa: E402

REF = "/root/reference"


def _load_ref_module(name: str):
    """Import one reference model submodule inside a synthetic package."""
    import importlib.util
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference checkout unavailable")
    if "refmodel" not in sys.modules:
        pkg = types.ModuleType("refmodel")
        pkg.__path__ = [f"{REF}/model"]
        sys.modules["refmodel"] = pkg
    # head.py does `from utils import make_anchors`
    if "utils" not in sys.modules or not hasattr(sys.modules["utils"], "make_anchors"):
        shim = types.ModuleType("utils")
        shim.make_anchors = lambda *a, **k: (None, None)
        sys.modules["utils"] = shim
    full = f"refmodel.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(full, f"{REF}/model/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def _max_rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-8))


@pytest.fixture(scope="module")
def rng_t():
    torch.manual_seed(7)
    return np.random.default_rng(7)


def test_backbone_roundtrip(rng_t):
    ref_bb_mod = _load_ref_module("backbone")
    c, d, dm = 16, 1, 0.5
    tb = ref_bb_mod.Backbone(c, d, dm).eval()
    # randomize BN running stats so the test can't pass with identity stats
    for m in tb.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.6, 1.4)

    sd = {f"backbone.{k}": v for k, v in tb.state_dict().items()}
    params, stats, unmapped = convert_focus_state_dict(sd)
    assert not [u for u in unmapped if "num_batches_tracked" not in u], unmapped

    from transparent_object_detection_tpu.models.backbone import Backbone

    fb = Backbone(c, d, dm, dtype=jnp.float32)
    x = rng_t.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    variables = fb.init(jax.random.key(0), jnp.asarray(x), train=False)
    merged, loaded, skipped = load_weights_partial(
        variables,
        {"params": params["backbone"], "batch_stats": stats["backbone"]},
    )
    assert not skipped, skipped
    feats = fb.apply(merged, jnp.asarray(x), train=False)

    with torch.no_grad():
        tfeats = tb(torch.from_numpy(x).permute(0, 3, 1, 2))
    for ours, theirs in zip(feats, tfeats):
        err = _max_rel(ours, theirs.permute(0, 2, 3, 1).numpy())
        assert err < 2e-4, err


def test_teb_roundtrip_repaired_forward(rng_t):
    ref_blocks = _load_ref_module("blocks")
    C = 64  # picks 8 heads in both frameworks (64 has no 128-aligned split)
    teb = ref_blocks.TransformerEncoderBlock(channels=C).eval()

    sd = {f"neck.h1.0.{k}": v for k, v in teb.state_dict().items()}
    params, stats, unmapped = convert_focus_state_dict(sd)
    assert not unmapped, unmapped

    from transparent_object_detection_tpu.models.blocks import TransformerEncoderBlock

    x = rng_t.uniform(-1, 1, size=(2, 8, 8, C)).astype(np.float32)
    ours_mod = TransformerEncoderBlock(num_heads=8, dtype=jnp.float32)
    variables = ours_mod.init(jax.random.key(0), jnp.asarray(x), train=False)
    merged, loaded, skipped = load_weights_partial(
        variables, {"params": params["neck"]["h1"]["teb"]}
    )
    assert not skipped, skipped
    ours = ours_mod.apply(merged, jnp.asarray(x), train=False)

    # repaired reference forward: same weights, batch-first attention
    with torch.no_grad():
        t = torch.from_numpy(x).reshape(2, 64, C)  # (B, N, C)
        n1 = teb.norm1(t)
        attn_out, _ = teb.attn(
            n1.transpose(0, 1), n1.transpose(0, 1), n1.transpose(0, 1)
        )  # seq-first inputs == correct per-image attention
        t = t + attn_out.transpose(0, 1)
        t = t + teb.mlp(teb.norm2(t))
        want = t.reshape(2, 8, 8, C).numpy()
    err = _max_rel(ours, want)
    assert err < 2e-4, err


def test_selfattention_roundtrip(rng_t):
    ref_blocks = _load_ref_module("blocks")
    C = 32
    sa = ref_blocks.SelfAttention(C).eval()
    with torch.no_grad():
        sa.gamma.fill_(0.7)  # nonzero so the attention branch matters

    sd = {f"backbone.dark3.2.{k}": v for k, v in sa.state_dict().items()}
    params, stats, unmapped = convert_focus_state_dict(sd)
    assert not unmapped, unmapped

    from transparent_object_detection_tpu.models.blocks import SelfAttention

    x = rng_t.uniform(-1, 1, size=(2, 8, 8, C)).astype(np.float32)
    ours_mod = SelfAttention(dtype=jnp.float32)
    variables = ours_mod.init(jax.random.key(0), jnp.asarray(x), train=False)
    merged, _, skipped = load_weights_partial(
        variables, {"params": params["backbone"]["dark3_attn"]}
    )
    assert not skipped, skipped
    ours = ours_mod.apply(merged, jnp.asarray(x), train=False)
    with torch.no_grad():
        want = sa(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    err = _max_rel(ours, want)
    assert err < 2e-4, err


def test_head_roundtrip_train_maps(rng_t):
    ref_head_mod = _load_ref_module("head")
    filters = (16, 32, 64)
    nc = 1
    th = ref_head_mod.Head(nc, filters).train()
    # BN randomization not needed: train-mode BN uses batch stats in both

    sd = {f"head.{k}": v for k, v in th.state_dict().items()}
    params, stats, unmapped = convert_focus_state_dict(sd)
    # only the DFL arange conv has no counterpart
    assert all("dfl" in u or "num_batches_tracked" in u for u in unmapped), unmapped

    from transparent_object_detection_tpu.models.head import Head

    feats = [
        rng_t.uniform(-1, 1, size=(2, 8, 8, filters[0])).astype(np.float32),
        rng_t.uniform(-1, 1, size=(2, 4, 4, filters[1])).astype(np.float32),
        rng_t.uniform(-1, 1, size=(2, 2, 2, filters[2])).astype(np.float32),
    ]
    ours_mod = Head(num_classes=nc, filters=filters, dtype=jnp.float32)
    variables = ours_mod.init(
        jax.random.key(0), [jnp.asarray(f) for f in feats], train=True
    )
    merged, _, skipped = load_weights_partial(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {"params": params["head"], "batch_stats": stats.get("head", {})},
    )
    assert not skipped, skipped

    # compare with eval-mode BN on both sides (running stats: deterministic);
    # the reference eval forward would hit the zeroed-strides decode (B4), so
    # run the towers directly, matching the raw-map surface
    with torch.no_grad():
        th.eval()
        tmaps = []
        for i, tf in enumerate([torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]):
            tmaps.append(torch.cat((th.box[i](tf), th.cls[i](tf)), 1))
    ours_eval, _ = ours_mod.apply(
        merged, [jnp.asarray(f) for f in feats], train=False, decode=False
    )
    for ours, theirs in zip(ours_eval, tmaps):
        err = _max_rel(ours, theirs.permute(0, 2, 3, 1).numpy())
        assert err < 2e-4, err


def test_full_basemodel_conversion_coverage():
    ref_base_mod = _load_ref_module("base")
    tm = ref_base_mod.BaseModel(1, 16, 1, 0.5)
    sd = tm.state_dict()
    params, stats, unmapped = convert_focus_state_dict(sd)
    bad = [u for u in unmapped if "dfl" not in u and "num_batches_tracked" not in u]
    assert not bad, bad

    from transparent_object_detection_tpu.models.detector import FocusModel, init_variables
    from transparent_object_detection_tpu.config import ModelConfig

    model = FocusModel(
        num_classes=1, base_channels=16, base_depth=1, deep_mul=0.5,
        dtype=jnp.float32,
    )
    cfg = ModelConfig(num_classes=1, input_shape=(64, 64), compute_dtype="float32")
    variables = init_variables(model, cfg)
    merged, loaded, skipped = load_weights_partial(
        variables, {"params": params, "batch_stats": stats}
    )
    # the only target leaves left at init are the neck reduce convs (the B3
    # repair, no reference counterpart); everything else is covered at equal
    # scale — no shape filtering kicks in
    assert loaded, "nothing imported"
    not_reduce = [s for s in skipped if "reduce" not in s]
    assert not not_reduce, not_reduce[:10]
    assert len(loaded) > 4 * len(skipped)
