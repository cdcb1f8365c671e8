"""XENT pretrainer and reference-shaped batch API."""

import numpy as np
import pytest

from nes_img_captioning_tpu.data.mscoco import CocoData
from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("cocodata")
    return make_synthetic_coco(str(d), n_train=32, n_val=8, n_test=8,
                               vocab_size=20, fc_feat_size=16)


def test_xent_pretrain_reduces_loss_and_lifts_cider(fixture):
    import jax

    from nes_img_captioning_tpu.pretrain import pretrain_xent, xent_loss
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    exp = {
        "dataset": "mscoco", "caption_options": fixture,
        "policy_options": {"fitness": "greedy", "vbn": False,
                           "model_options": {"input_encoding_size": 16,
                                             "rnn_size": 16,
                                             "fc_feat_size": 16}},
    }
    task = CocoTask(exp, Config(batch_size=8, val_batch_size=8,
                                num_val_items=8), TpuConfig(seed=0))
    theta0 = task.generate_theta(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    caps = jnp.asarray(np.stack([np.asarray(g[0], np.int32)
                                 for g in task.train_gts]))
    loss0 = float(xent_loss(task.model, theta0, task.train_fc, caps))

    theta = pretrain_xent(task, steps=150, lr=5e-3, batch_size=16,
                          log_every=0)
    loss1 = float(xent_loss(task.model, theta, task.train_fc, caps))
    assert loss1 < loss0 * 0.7  # teacher-forcing loss drops substantially
    # CIDEr of the pretrained model beats a random model's
    assert task.validate(theta) > task.validate(theta0)


def test_coco_batcher_reference_shape(fixture):
    d = CocoData(fixture)
    b = d.batcher("train", 4)
    batch = b.get_batch()
    spi, T = 5, d.seq_length
    assert batch["fc_feats"].shape == (4 * spi, 16)
    # every image's features repeated seq_per_img times
    np.testing.assert_array_equal(batch["fc_feats"][0], batch["fc_feats"][4])
    assert batch["labels"].shape == (4 * spi, T + 2)
    assert (batch["labels"][:, 0] == 0).all()  # bos column
    assert (batch["labels"][:, -1] == 0).all()
    assert len(batch["gts"]) == 4
    assert set(batch["bounds"]) == {"it_pos_now", "it_max", "wrapped"}
    assert {"ix", "id", "file_path"} <= set(batch["infos"][0])


def test_coco_batcher_epoch_wrap_reshuffles(fixture):
    d = CocoData(fixture)
    b = d.batcher("train", 8)
    seen_wrapped = False
    for _ in range(10):  # 32 images / 8 per batch -> wraps
        batch = next(b)
        seen_wrapped = seen_wrapped or batch["bounds"]["wrapped"]
    assert seen_wrapped
    assert len(b) == 4
