"""Exporter tests: torchvision/HF state dicts → reference format → identical
model behavior through both converters."""

import numpy as np
import pytest
import torch

from vit_with_opencl_tpu import ViTConfig
from vit_with_opencl_tpu.harness import fixtures
from vit_with_opencl_tpu.io import binfmt, export
from vit_with_opencl_tpu.models import golden

CFG = ViTConfig(
    name="exp_small", img_size=32, patch_size=8, embed_dim=48, depth=2,
    num_heads=4, num_classes=9,
)


@pytest.fixture(scope="module")
def named_params():
    return fixtures.random_params(CFG, seed=4, scale=0.05)


def _to_torchvision_state(params):
    d = CFG.embed_dim
    state = {
        "class_token": torch.from_numpy(params["class_token"].reshape(1, 1, d).copy()),
        "conv_proj.weight": torch.from_numpy(params["conv_proj_weight"].copy()),
        "conv_proj.bias": torch.from_numpy(params["conv_proj_bias"].copy()),
        "encoder.pos_embedding": torch.from_numpy(
            params["encoder_pos_embedding"].reshape(1, CFG.num_tokens, d).copy()
        ),
        "encoder.ln.weight": torch.from_numpy(params["encoder_ln_weight"].copy()),
        "encoder.ln.bias": torch.from_numpy(params["encoder_ln_bias"].copy()),
        "heads.head.weight": torch.from_numpy(params["heads_head_weight"].copy()),
        "heads.head.bias": torch.from_numpy(params["heads_head_bias"].copy()),
    }
    for i in range(CFG.depth):
        src = f"encoder_layers_encoder_layer_{i}_"
        dst = f"encoder.layers.encoder_layer_{i}."
        state[dst + "ln_1.weight"] = torch.from_numpy(params[src + "ln_1_weight"].copy())
        state[dst + "ln_1.bias"] = torch.from_numpy(params[src + "ln_1_bias"].copy())
        state[dst + "self_attention.in_proj_weight"] = torch.from_numpy(
            params[src + "self_attention_in_proj_weight"].copy()
        )
        state[dst + "self_attention.in_proj_bias"] = torch.from_numpy(
            params[src + "self_attention_in_proj_bias"].copy()
        )
        state[dst + "self_attention.out_proj.weight"] = torch.from_numpy(
            params[src + "self_attention_out_proj_weight"].copy()
        )
        state[dst + "self_attention.out_proj.bias"] = torch.from_numpy(
            params[src + "self_attention_out_proj_bias"].copy()
        )
        state[dst + "ln_2.weight"] = torch.from_numpy(params[src + "ln_2_weight"].copy())
        state[dst + "ln_2.bias"] = torch.from_numpy(params[src + "ln_2_bias"].copy())
        state[dst + "mlp.0.weight"] = torch.from_numpy(params[src + "mlp_0_weight"].copy())
        state[dst + "mlp.0.bias"] = torch.from_numpy(params[src + "mlp_0_bias"].copy())
        state[dst + "mlp.3.weight"] = torch.from_numpy(params[src + "mlp_3_weight"].copy())
        state[dst + "mlp.3.bias"] = torch.from_numpy(params[src + "mlp_3_bias"].copy())
    return state


def _to_hf_state(params):
    d = CFG.embed_dim
    state = {
        "vit.embeddings.cls_token": params["class_token"].reshape(1, 1, d),
        "vit.embeddings.patch_embeddings.projection.weight": params["conv_proj_weight"],
        "vit.embeddings.patch_embeddings.projection.bias": params["conv_proj_bias"],
        "vit.embeddings.position_embeddings": params["encoder_pos_embedding"].reshape(
            1, CFG.num_tokens, d
        ),
        "vit.layernorm.weight": params["encoder_ln_weight"],
        "vit.layernorm.bias": params["encoder_ln_bias"],
        "classifier.weight": params["heads_head_weight"],
        "classifier.bias": params["heads_head_bias"],
    }
    for i in range(CFG.depth):
        src = f"encoder_layers_encoder_layer_{i}_"
        dst = f"vit.encoder.layer.{i}."
        in_w = params[src + "self_attention_in_proj_weight"]
        in_b = params[src + "self_attention_in_proj_bias"]
        state[dst + "attention.attention.query.weight"] = in_w[:d]
        state[dst + "attention.attention.key.weight"] = in_w[d : 2 * d]
        state[dst + "attention.attention.value.weight"] = in_w[2 * d :]
        state[dst + "attention.attention.query.bias"] = in_b[:d]
        state[dst + "attention.attention.key.bias"] = in_b[d : 2 * d]
        state[dst + "attention.attention.value.bias"] = in_b[2 * d :]
        state[dst + "attention.output.dense.weight"] = params[
            src + "self_attention_out_proj_weight"
        ]
        state[dst + "attention.output.dense.bias"] = params[
            src + "self_attention_out_proj_bias"
        ]
        state[dst + "layernorm_before.weight"] = params[src + "ln_1_weight"]
        state[dst + "layernorm_before.bias"] = params[src + "ln_1_bias"]
        state[dst + "layernorm_after.weight"] = params[src + "ln_2_weight"]
        state[dst + "layernorm_after.bias"] = params[src + "ln_2_bias"]
        state[dst + "intermediate.dense.weight"] = params[src + "mlp_0_weight"]
        state[dst + "intermediate.dense.bias"] = params[src + "mlp_0_bias"]
        state[dst + "output.dense.weight"] = params[src + "mlp_3_weight"]
        state[dst + "output.dense.bias"] = params[src + "mlp_3_bias"]
    return state


def test_torchvision_roundtrip(named_params, tmp_path):
    state = _to_torchvision_state(named_params)
    converted = export.from_torchvision_state_dict(state, CFG)
    for name in converted:
        np.testing.assert_array_equal(converted[name], named_params[name])
    files = export.export_weights(converted, tmp_path / "Network", CFG)
    assert files[0] == "Weight_0_class_token.bin"
    loaded = binfmt.load_weights(tmp_path / "Network", CFG, round_to_6dp=False,
                                 strict=True)
    named = binfmt.weights_to_dict(loaded, CFG)
    for name in named_params:
        np.testing.assert_array_equal(named[name], named_params[name])


def test_hf_roundtrip_same_model_output(named_params, tmp_path):
    """HF-naming conversion must produce identical golden predictions."""
    state = _to_hf_state(named_params)
    converted = export.from_hf_state_dict(state, CFG)
    images = fixtures.random_images(CFG, n=1, seed=6)
    ref = golden.golden_forward(images, named_params, CFG)
    got = golden.golden_forward(images, converted, CFG)
    np.testing.assert_array_equal(got, ref)


def test_export_validates_shapes(named_params):
    state = _to_torchvision_state(named_params)
    state["conv_proj.weight"] = state["conv_proj.weight"][:, :2]  # corrupt
    with pytest.raises(ValueError, match="conv_proj_weight"):
        export.from_torchvision_state_dict(state, CFG)


def test_export_missing_key(named_params):
    state = _to_torchvision_state(named_params)
    del state["encoder.ln.weight"]
    with pytest.raises(KeyError):
        export.from_torchvision_state_dict(state, CFG)


def test_export_from_pretrained_offline_error(tmp_path):
    with pytest.raises(RuntimeError, match="no network|not available|local"):
        export.export_from_pretrained(
            "google/vit-definitely-not-cached", tmp_path, CFG
        )

# ---------------------------------------------------------------------------
# Ground-truth byte parity against the reference's shipped Network/ directory
# (SURVEY §7 step 1: pin the exporter to the real files, not synthetic dicts).
# 116 of 152 files are present on the mount; the 36 stripped large blobs are
# zero-filled on the torchvision side and excluded from the comparison.
# ---------------------------------------------------------------------------

import os

REF_NETWORK = "/root/reference/MulticoreMainProject/Network"


@pytest.mark.skipif(not os.path.isdir(REF_NETWORK),
                    reason="reference Network/ not mounted")
def test_exporter_ground_truth_byte_parity(tmp_path):
    """Real files → reconstructed torchvision state dict → export → the
    exact same bytes, for every one of the 116 present reference files."""
    from vit_with_opencl_tpu.config import get_config

    cfg = get_config("vit_b_16_224")
    raw = binfmt.load_weights(REF_NETWORK, cfg, round_to_6dp=False)
    present = binfmt.weights_to_dict(raw, cfg)
    assert len(present) >= 116

    shapes = binfmt.weight_shapes(cfg)
    named = {
        n: present.get(n, np.zeros(shapes[n], np.float32))
        for n in binfmt.weight_names(cfg)
    }
    # Reconstruct the torchvision state dict (inverse reshapes of the
    # exporter's key map), then push it back through the exporter.
    d = cfg.embed_dim
    state = {
        "class_token": named["class_token"].reshape(1, 1, d),
        "conv_proj.weight": named["conv_proj_weight"],
        "conv_proj.bias": named["conv_proj_bias"],
        "encoder.pos_embedding": named["encoder_pos_embedding"].reshape(
            1, cfg.num_tokens, d
        ),
        "encoder.ln.weight": named["encoder_ln_weight"],
        "encoder.ln.bias": named["encoder_ln_bias"],
        "heads.head.weight": named["heads_head_weight"],
        "heads.head.bias": named["heads_head_bias"],
    }
    for i in range(cfg.depth):
        src = f"encoder_layers_encoder_layer_{i}_"
        dst = f"encoder.layers.encoder_layer_{i}."
        for src_key, dst_key in (
            ("ln_1_weight", "ln_1.weight"),
            ("ln_1_bias", "ln_1.bias"),
            ("self_attention_in_proj_weight", "self_attention.in_proj_weight"),
            ("self_attention_in_proj_bias", "self_attention.in_proj_bias"),
            ("self_attention_out_proj_weight", "self_attention.out_proj.weight"),
            ("self_attention_out_proj_bias", "self_attention.out_proj.bias"),
            ("ln_2_weight", "ln_2.weight"),
            ("ln_2_bias", "ln_2.bias"),
            ("mlp_0_weight", "mlp.0.weight"),
            ("mlp_0_bias", "mlp.0.bias"),
            ("mlp_3_weight", "mlp.3.weight"),
            ("mlp_3_bias", "mlp.3.bias"),
        ):
            state[dst + dst_key] = named[src + src_key]

    converted = export.from_torchvision_state_dict(state, cfg)
    out_dir = tmp_path / "Network"
    export.export_weights(converted, out_dir, cfg)

    checked = 0
    for fname in sorted(os.listdir(REF_NETWORK)):
        if binfmt.parse_index_from_filename(fname) is None:
            continue
        with open(os.path.join(REF_NETWORK, fname), "rb") as f:
            ref_bytes = f.read()
        with open(out_dir / fname, "rb") as f:
            got_bytes = f.read()
        assert got_bytes == ref_bytes, f"byte mismatch in {fname}"
        checked += 1
    assert checked == len(present)


# -- the real-weight parity drill (VERDICT r3 #9) -----------------------------


def test_to_torchvision_state_dict_roundtrip(named_params):
    """export.to_torchvision_state_dict is the exact inverse of
    from_torchvision_state_dict."""
    state = export.to_torchvision_state_dict(named_params, CFG)
    back = export.from_torchvision_state_dict(state, CFG)
    assert set(back) == set(named_params)
    for name in named_params:
        np.testing.assert_array_equal(back[name], named_params[name])


def test_real_weight_parity_drill_end_to_end(tmp_path):
    """scripts/real_weight_parity.py with a synthetic torchvision .pth
    standing in for the stripped real checkpoint: export → golden + tpu
    backends → comparator PASS, one command. The moment the real blobs or
    network access appear, the standing real-weight gap closes by swapping
    the checkpoint path."""
    import importlib.util
    import os

    from vit_with_opencl_tpu import get_config
    from vit_with_opencl_tpu.harness import results
    from vit_with_opencl_tpu.models import golden as golden_mod

    cfg = get_config("vit_tiny_16_224")
    params = fixtures.random_params(cfg, seed=7, scale=0.05)
    # The synthetic stand-in checkpoint, torchvision naming.
    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export.to_torchvision_state_dict(params, cfg).items()
    }
    ckpt = tmp_path / "vit_tiny_synthetic.pth"
    torch.save(state, ckpt)
    # Input + answer file from the fp32 oracle (weights 6dp-rounded, the
    # reference loader behavior the CLI applies by default).
    images = fixtures.random_images(cfg, n=2, seed=8)
    binfmt.save_image_data(tmp_path / "input.bin", images)
    rounded = {k: binfmt.round_6dp(v) for k, v in params.items()}
    results.write_results(
        tmp_path / "answer.txt",
        golden_mod.golden_forward(images, rounded, cfg))

    spec = importlib.util.spec_from_file_location(
        "real_weight_parity",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "real_weight_parity.py"))
    drill = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(drill)
    rc = drill.main([
        "--checkpoint", str(ckpt), "--config", "vit_tiny_16_224",
        "--input", str(tmp_path / "input.bin"),
        "--answer", str(tmp_path / "answer.txt"),
        "--backends", "golden,tpu",
        # exercise the calibrated outlier-aware mode end to end too (the
        # mode real trained weights will need; it calibrates on --input)
        "--quantize", "none,int8-w8a8-outlier",
        "--workdir", str(tmp_path / "work"),
    ])
    assert rc == 0
    # Tampered answer → the drill FAILS (the gate is real).
    bad = (tmp_path / "answer.txt").read_text().replace(
        "label:", "label:", 1)
    lines = bad.splitlines()
    first = lines[0]
    lab = int(first.split("label: ")[1].split(" ")[0])
    lines[0] = first.replace(f"label: {lab}", f"label: {(lab + 1) % 10}")
    (tmp_path / "answer_bad.txt").write_text("\n".join(lines) + "\n")
    rc = drill.main([
        "--checkpoint", str(ckpt), "--config", "vit_tiny_16_224",
        "--input", str(tmp_path / "input.bin"),
        "--answer", str(tmp_path / "answer_bad.txt"),
        "--backends", "golden",
        "--workdir", str(tmp_path / "work2"),
    ])
    assert rc == 1
