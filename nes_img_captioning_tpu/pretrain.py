"""Teacher-forced cross-entropy (XENT) pretrainer for the FC captioner.

The reference's evolution runs warm-start from a backprop-pretrained
checkpoint (``"from_single": "pretrained/bu_xent_09.pth"`` in
experiments/mscoco_*.json; the checkpoint comes from the external
self-critical.pytorch XENT trainer — reference README.md:98-106 and
.MISSING_LARGE_BLOBS). This module supplies that missing half of the
workflow natively: a jitted Adam + teacher-forcing trainer producing
reference-format .pth checkpoints that ``from_single`` consumes.

Training objective (standard NIC XENT): feed the image embedding at t=0,
<bos>=0 at t=1, then gold tokens; per-step softmax cross-entropy on the gold
caption, masked to caption length + one EOS step.

Usage:
    python -m nes_img_captioning_tpu.pretrain --exp_file experiments/mscoco_nes.json \
        --steps 3000 --lr 5e-4 --out pretrained/xent.pth
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .utils.logger import setup_logging

logger = logging.getLogger(__name__)

__all__ = ["xent_loss", "pretrain_xent"]


def xent_loss(model, theta, fc_feats, captions):
    """Mean masked token cross-entropy.

    captions: (B, T) gold tokens, 0-padded. Targets are caption tokens then
    one EOS (0); inputs are <bos>, then gold tokens (teacher forcing).
    """
    p = model.spec.unravel(theta)
    o = model.options
    B, T = captions.shape

    h = jnp.zeros((B, o.rnn_size), theta.dtype)
    c = jnp.zeros((B, o.rnn_size), theta.dtype)
    _, h, c = model.lstm_core(p, model._img_embed(p, fc_feats), h, c)

    # inputs: [<bos>, w1 .. w_{T-1}]; targets: [w1 .. w_T-ish] with EOS
    inputs = jnp.concatenate(
        [jnp.zeros((B, 1), captions.dtype), captions[:, :-1]], axis=1
    )
    # mask: token positions + the first EOS position
    tok_mask = (captions > 0).astype(jnp.float32)
    eos_mask = jnp.concatenate(
        [jnp.ones((B, 1), jnp.float32), tok_mask[:, :-1]], axis=1
    )
    mask = jnp.maximum(tok_mask, eos_mask)

    def step(carry, xs):
        h, c = carry
        it, tgt, m = xs
        xt = model._embed(p, it)
        out, h, c = model.lstm_core(p, xt, h, c)
        logp = jax.nn.log_softmax(
            (out @ p["logit.weight"].T) + p["logit.bias"], axis=-1
        )
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        return (h, c), nll * m

    (_, _), nlls = jax.lax.scan(
        step, (h, c),
        (inputs.T, captions.T, mask.T),
    )
    return nlls.sum() / jnp.maximum(mask.sum(), 1.0)


def pretrain_xent(task, steps: int = 1000, lr: float = 5e-4,
                  batch_size: int = 64, seed: int = 0,
                  log_every: int = 100):
    """Backprop-train the task's captioning model; returns final theta."""
    from .data.core import EpochSampler

    model = task.model
    data = task.data
    # gold captions: first caption row of each train image, on device
    gts = task.train_gts
    caps = jnp.asarray(
        np.stack([np.asarray(g[0], np.int32) for g in gts])
    )
    feats = task.train_fc

    theta = task.generate_theta(jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(theta)

    @jax.jit
    def train_step(theta, opt_state, idx):
        loss, grad = jax.value_and_grad(
            lambda th: xent_loss(model, th, feats[idx], caps[idx])
        )(theta)
        updates, opt_state = opt.update(grad, opt_state)
        return optax.apply_updates(theta, updates), opt_state, loss

    sampler = EpochSampler(task.train_n, seed=seed)
    for i in range(steps):
        idx = jnp.asarray(sampler.batch(batch_size))
        theta, opt_state, loss = train_step(theta, opt_state, idx)
        if log_every and (i + 1) % log_every == 0:
            logger.info("xent step %d: loss %.4f", i + 1, float(loss))
    return theta


def run(argv=None):
    from .tasks import make_task
    from .utils.config import load_experiment, parse_config, parse_tpu_config

    parser = argparse.ArgumentParser()
    parser.add_argument("--exp_file", type=str,
                        default="experiments/mscoco_nes.json")
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="pretrained/xent.pth")
    args = parser.parse_args(argv)

    setup_logging()
    exp = load_experiment(args.exp_file)
    config = parse_config(exp)
    task = make_task(exp, config, parse_tpu_config(exp))
    theta = pretrain_xent(task, steps=args.steps, lr=args.lr,
                          batch_size=args.batch_size, seed=args.seed)
    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    task.spec.save_pth(np.asarray(theta), args.out)
    score = task.validate(theta)
    logger.info("saved %s (val CIDEr %.4f)", args.out, score)
    return args.out


if __name__ == "__main__":
    run()
