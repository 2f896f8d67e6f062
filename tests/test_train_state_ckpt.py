"""Full TrainState checkpoint (params + optimizer moments + step) resume."""

import jax
import numpy as np

from caesar_mrcnn_tpu.config import detector_config
from caesar_mrcnn_tpu.models.mask_rcnn import init_model
from caesar_mrcnn_tpu.train.checkpoints import load_train_state, save_train_state
from caesar_mrcnn_tpu.train.trainer import TrainState, create_train_state


def test_train_state_roundtrip(tmp_path):
    cfg = detector_config(
        backbone="custom", image_min_dim=64, image_max_dim=64,
        num_classes=2, class_names=("bkg", "source"),
        rpn_anchor_scales=(8, 16, 32, 64, 128), compute_dtype="float32",
        optimizer="adam",
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    state, tx = create_train_state(cfg, variables)
    # mutate so the saved state differs from a fresh one
    bumped_params = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    state = TrainState(state.step + 7, bumped_params, state.batch_stats, state.opt_state)

    path = save_train_state(str(tmp_path), "m", 2, state)
    template, _ = create_train_state(cfg, init_model(cfg, jax.random.PRNGKey(3))[1])
    restored = load_train_state(path, template)

    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state tree restored with matching structure
    assert jax.tree_util.tree_structure(restored.opt_state) == jax.tree_util.tree_structure(
        template.opt_state
    )
