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
