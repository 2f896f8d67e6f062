"""Keras/Matterport .h5 weight interop (reference: mrcnn/model.py:2197-2239).

The real published blob is LFS-stripped in the reference checkout, so the
tests roundtrip through a synthetically written h5 that uses the exact
reference layer names/layout (VERDICT r2 item 8).
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax  # noqa: E402

from caesar_mrcnn_tpu.config import detector_config  # noqa: E402
from caesar_mrcnn_tpu.models.mask_rcnn import init_model  # noqa: E402
from caesar_mrcnn_tpu.train import keras_import as K  # noqa: E402


@pytest.fixture(scope="module")
def small_model():
    cfg = detector_config(
        num_classes=4, class_names=("bkg", "sidelobe", "source", "galaxy"),
        image_min_dim=128, image_max_dim=128, backbone="resnet50",
        images_per_device=1, num_devices=1,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(7))
    return cfg, model, variables


def test_name_mapping_bijective(small_model):
    """Every variable leaf maps to a keras layer and back to itself."""
    _, _, variables = small_model
    layers = K.variables_to_keras(variables)
    # reference naming spot checks
    assert "conv1" in layers and "bn_conv1" in layers
    assert "res2a_branch2a" in layers and "res2a_branch1" in layers
    assert "bn3d_branch2c" in layers
    assert "res4f_branch2b" in layers  # resnet50 stage 4 ends at 'f'
    assert "rpn_conv_shared" in layers
    assert "mrcnn_class_conv1" in layers and "mrcnn_bbox_fc" in layers
    assert "mrcnn_mask_deconv" in layers
    assert set(layers["bn_conv1"]) == {"gamma", "beta", "moving_mean",
                                       "moving_variance"}

    tree, unmapped = K.keras_to_variables(layers)
    assert unmapped == []
    flat_orig = {
        tuple(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(variables)
    }
    flat_back = {
        tuple(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(tree)
    }
    assert set(flat_back) == set(flat_orig)
    for key in flat_orig:
        np.testing.assert_array_equal(flat_back[key], flat_orig[key])


def test_h5_roundtrip_and_restore(small_model, tmp_path):
    """export -> keras h5 file -> restore_from_keras_h5 loads every leaf."""
    _, _, variables = small_model
    path = str(tmp_path / "mrcnn_weights.h5")
    K.write_keras_h5(K.variables_to_keras(variables), path)

    # file structure is the Keras save_weights layout
    with h5py.File(path, "r") as f:
        names = [n.decode() for n in f.attrs["layer_names"]]
        assert "res2a_branch2a" in names
        g = f["rpn_conv_shared"]
        wn = [n.decode() for n in g.attrs["weight_names"]]
        assert wn[0] == "rpn_conv_shared/kernel:0"

    # fresh init + by-name restore reproduces the exported weights
    cfg, _, _ = small_model
    _, fresh = init_model(cfg, jax.random.PRNGKey(99))
    merged, loaded, skipped = K.restore_from_keras_h5(fresh, path)
    assert skipped == []
    orig = jax.tree_util.tree_leaves(variables)
    got = jax.tree_util.tree_leaves(merged)
    assert len(orig) == len(got)
    for a, b in zip(orig, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # exclude knob (gray-input conv1 retraining, scripts/run.py:1737-1740)
    merged2, _, _ = K.restore_from_keras_h5(fresh, path, exclude=["conv1"])
    fresh_k = np.asarray(fresh["params"]["backbone"]["conv1"]["kernel"])
    got_k = np.asarray(merged2["params"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(got_k, fresh_k)  # conv1 kept fresh
    got_fpn = np.asarray(merged2["params"]["fpn"]["fpn_p2"]["kernel"])
    np.testing.assert_array_equal(
        got_fpn, np.asarray(variables["params"]["fpn"]["fpn_p2"]["kernel"])
    )


def matterport_layer_inventory(arch: str) -> set:
    """The COMPLETE weight-layer inventory of the reference graph
    (reference: mrcnn/model.py:175-210 resnet_graph block letters,
    model.py:2003-2026 FPN, model.py:960-979 RPN sub-model,
    model.py:986-1091 heads) — built here independently from the
    Matterport naming rule so a missing mapping in keras_import cannot
    hide (VERDICT r3 item 8)."""
    stage4 = "abcdef" if arch == "resnet50" else "abcdefghijklmnopqrstuvw"
    blocks = {2: "abc", 3: "abcd", 4: stage4, 5: "abc"}
    names = {"conv1", "bn_conv1"}
    for stage, letters in blocks.items():
        for b in letters:
            branches = ["2a", "2b", "2c"] + (["1"] if b == "a" else [])
            for br in branches:
                names.add(f"res{stage}{b}_branch{br}")
                names.add(f"bn{stage}{b}_branch{br}")
    names |= {"fpn_c5p5", "fpn_c4p4", "fpn_c3p3", "fpn_c2p2",
              "fpn_p2", "fpn_p3", "fpn_p4", "fpn_p5"}
    names |= {"rpn_conv_shared", "rpn_class_raw", "rpn_bbox_pred"}
    names |= {"mrcnn_class_conv1", "mrcnn_class_bn1", "mrcnn_class_conv2",
              "mrcnn_class_bn2", "mrcnn_class_logits", "mrcnn_bbox_fc"}
    names |= {f"mrcnn_mask_conv{i}" for i in range(1, 5)}
    names |= {f"mrcnn_mask_bn{i}" for i in range(1, 5)}
    names |= {"mrcnn_mask_deconv", "mrcnn_mask"}
    return names


@pytest.mark.parametrize("arch", ["resnet50", "resnet101"])
@pytest.mark.parametrize("nclasses", [4, 6])
def test_exhaustive_layer_inventory_roundtrip(arch, nclasses, tmp_path):
    """Every reference layer name for both backbones and both caesar class
    counts (3-class and 5-class sets, scripts/run.py:1287) maps, survives
    import -> export -> import, and the restored tree is bit-identical."""
    cnames = tuple(f"c{i}" for i in range(nclasses))
    cfg = detector_config(
        num_classes=nclasses, class_names=cnames, backbone=arch,
        image_min_dim=128, image_max_dim=128,
        images_per_device=1, num_devices=1,
    )
    _, variables = init_model(cfg, jax.random.PRNGKey(3))

    layers = K.variables_to_keras(variables)
    expected = matterport_layer_inventory(arch)
    assert set(layers) == expected, (
        f"missing={sorted(expected - set(layers))} "
        f"extra={sorted(set(layers) - expected)}"
    )

    tree, unmapped = K.keras_to_variables(layers)
    assert unmapped == []
    # full roundtrip through the h5 file + by-name restore: tree-identical
    path = str(tmp_path / f"{arch}_{nclasses}.h5")
    K.write_keras_h5(layers, path)
    _, fresh = init_model(cfg, jax.random.PRNGKey(11))
    merged, loaded, skipped = K.restore_from_keras_h5(fresh, path)
    assert skipped == []
    orig_flat = jax.tree_util.tree_leaves_with_path(variables)
    got_flat = jax.tree_util.tree_leaves_with_path(merged)
    assert len(orig_flat) == len(got_flat)
    for (pa, a), (pb, b) in zip(orig_flat, got_flat):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # export of the restored tree reproduces the stored file exactly
    layers2 = K.variables_to_keras(merged)
    assert set(layers2) == expected
    for lname in layers:
        for wname in layers[lname]:
            np.testing.assert_array_equal(
                layers2[lname][wname], layers[lname][wname]
            )


def test_rpn_model_scope_prefixed_weight_names(small_model, tmp_path):
    """Keras writers that scope nested sub-model weights as
    'rpn_model/<inner>/<w>:0' must still map (keras_import strips the
    enclosing group name); and a file whose core layers all fail to map
    must raise instead of silently returning random heads."""
    _, _, variables = small_model
    layers = K.variables_to_keras(variables)
    path = str(tmp_path / "scoped.h5")
    rpn_names = ["rpn_conv_shared", "rpn_class_raw", "rpn_bbox_pred"]
    with h5py.File(path, "w") as f:
        outer = [n for n in layers if n not in rpn_names] + ["rpn_model"]
        f.attrs["layer_names"] = np.array([n.encode() for n in outer], dtype="S64")
        for lname in layers:
            if lname in rpn_names:
                continue
            lg = f.create_group(lname)
            wn = [f"{lname}/{s}:0" for s in layers[lname]]
            lg.attrs["weight_names"] = np.array([n.encode() for n in wn], dtype="S96")
            for s, arr in layers[lname].items():
                lg.create_dataset(f"{lname}/{s}:0", data=np.asarray(arr))
        rg = f.create_group("rpn_model")
        wn = [f"rpn_model/{n}/{s}:0" for n in rpn_names for s in layers[n]]
        rg.attrs["weight_names"] = np.array([n.encode() for n in wn], dtype="S96")
        for n in rpn_names:
            for s, arr in layers[n].items():
                rg.create_dataset(f"rpn_model/{n}/{s}:0", data=np.asarray(arr))

    cfg, _, _ = small_model
    _, fresh = init_model(cfg, jax.random.PRNGKey(5))
    merged, _, skipped = K.restore_from_keras_h5(fresh, path)
    assert skipped == []
    got = np.asarray(merged["params"]["rpn_head"]["rpn_conv_shared"]["kernel"])
    np.testing.assert_array_equal(
        got, np.asarray(variables["params"]["rpn_head"]["rpn_conv_shared"]["kernel"])
    )

    # failure mode: core layers present but unmappable -> loud error
    bad = str(tmp_path / "bad.h5")
    renamed = {
        (f"tower_0/{n}" if n.startswith(("rpn_", "mrcnn_")) else n): w
        for n, w in layers.items()
    }
    K.write_keras_h5(renamed, bad)
    with pytest.raises(ValueError, match="rpn_.*mrcnn"):
        K.restore_from_keras_h5(fresh, bad)


def test_deconv_kernel_axes_swap(small_model, tmp_path):
    """Keras Conv2DTranspose stores [kh,kw,out,in]; the importer must swap
    to flax's [kh,kw,in,out] (detectable only with asymmetric content)."""
    _, _, variables = small_model
    layers = K.variables_to_keras(variables)
    flax_kernel = np.asarray(
        variables["params"]["mask_head"]["mrcnn_mask_deconv"]["kernel"]
    )
    keras_kernel = layers["mrcnn_mask_deconv"]["kernel"]
    np.testing.assert_array_equal(keras_kernel, np.swapaxes(flax_kernel, 2, 3))
    tree, _ = K.keras_to_variables(layers)
    np.testing.assert_array_equal(
        np.asarray(tree["params"]["mask_head"]["mrcnn_mask_deconv"]["kernel"]),
        flax_kernel,
    )


def test_backbone_only_restore_with_core_exclude(small_model, tmp_path):
    """exclude patterns that deliberately skip the rpn/head layers are a
    legitimate transfer-learning restore (backbone only) — the loud
    mapping-failure check must not fire for them."""
    _, _, variables = small_model
    path = str(tmp_path / "mrcnn_weights.h5")
    K.write_keras_h5(K.variables_to_keras(variables), path)

    cfg, _, _ = small_model
    _, fresh = init_model(cfg, jax.random.PRNGKey(7))
    merged, loaded, _ = K.restore_from_keras_h5(
        fresh, path, exclude=["rpn_head", "classifier_head", "mask_head"]
    )
    assert not any("rpn" in n or "head" in n for n in loaded)
    # backbone restored, head kept fresh
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["backbone"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["backbone"]["conv1"]["kernel"]),
    )
    got = np.asarray(
        merged["params"]["classifier_head"]["mrcnn_class_logits"]["kernel"]
    )
    np.testing.assert_array_equal(
        got,
        np.asarray(
            fresh["params"]["classifier_head"]["mrcnn_class_logits"]["kernel"]
        ),
    )


def test_restore_weights_dispatches_h5_and_orbax(small_model, tmp_path):
    """The single --weights entry point accepts BOTH formats the reference
    CLI accepts: a Keras .h5 blob (mrcnn/model.py:2197-2239) and a native
    checkpoint directory."""
    from caesar_mrcnn_tpu.train.checkpoints import (
        restore_weights,
        save_checkpoint,
    )

    cfg, _, variables = small_model
    h5_path = str(tmp_path / "weights.h5")
    K.write_keras_h5(K.variables_to_keras(variables), h5_path)
    ckpt_path = save_checkpoint(str(tmp_path), "tiny", 3, variables)

    _, fresh = init_model(cfg, jax.random.PRNGKey(123))
    for path in (h5_path, ckpt_path):
        merged, _, _ = restore_weights(fresh, path)
        for a, b in zip(
            jax.tree_util.tree_leaves(variables),
            jax.tree_util.tree_leaves(merged),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # exclude list reaches both backends
    merged2, _, _ = restore_weights(fresh, h5_path, exclude=["conv1"])
    np.testing.assert_array_equal(
        np.asarray(merged2["params"]["backbone"]["conv1"]["kernel"]),
        np.asarray(fresh["params"]["backbone"]["conv1"]["kernel"]),
    )
