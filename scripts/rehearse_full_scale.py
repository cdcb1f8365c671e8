"""Full-scale data-path rehearsal: the real MSCOCO Karpathy-split shape
(113,287 train + 5,000 val + 5,000 test images, 2048-d features, vocab 9487)
generated in the reference's on-disk format, then driven through the actual
loading pipeline:

    per-image .npy dir  ->  one-time consolidation (_load_fc)  ->  mmap reload
    ->  device upload of the ~926 MB train feature matrix  ->  epoch sampling
    at the true mscoco_nes regime (2000 pairs x batch 64).

Exists because every training fixture before round 4 topped out at 8,192
images — consolidation time, RAM and the real-size device upload were
unmeasured (VERDICT r3 weak #4). Numbers land in docs/RESULTS.md.

Reference data contract: src/captioning/dataloader.py:56-98,238-240.

Usage:
    python scripts/rehearse_full_scale.py [--data /tmp/nes_fullscale]
        [--n-train 113287] [--no-upload] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rss_gb() -> float:
    import psutil

    return psutil.Process(os.getpid()).memory_info().rss / 2**30


def generate(data_dir: str, n_train: int, n_val: int, n_test: int,
             vocab: int, feat: int) -> dict:
    """Real-format fixture at full scale. The per-image feature files are
    written by a vectorized chunk loop (the reference format is one
    <id>.npy per image; content is random — the data PATH is under test,
    not the pixels)."""
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco

    marker = os.path.join(data_dir, "SCALE.json")
    want = {"n_train": n_train, "n_val": n_val, "n_test": n_test,
            "vocab": vocab, "feat": feat}
    if os.path.isfile(marker) and json.load(open(marker)) == want:
        log(f"fixture already generated at {data_dir}")
        return {
            "input_json": os.path.join(data_dir, "cocotalk.json"),
            "input_label_h5": os.path.join(data_dir, "cocotalk_label.h5"),
            "input_fc_dir": os.path.join(data_dir, "fc"),
        }
    shutil.rmtree(data_dir, ignore_errors=True)
    t0 = time.time()
    copts = make_synthetic_coco(
        data_dir, n_train=n_train, n_val=n_val, n_test=n_test,
        vocab_size=vocab, fc_feat_size=feat, cap_len=9, seed=0,
    )
    json.dump(want, open(marker, "w"))
    n = n_train + n_val + n_test
    log(f"generated {n} per-image .npy files + labels h5 in "
        f"{time.time() - t0:.0f}s")
    return copts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/nes_fullscale")
    ap.add_argument("--n-train", type=int, default=113287)
    ap.add_argument("--n-val", type=int, default=5000)
    ap.add_argument("--n-test", type=int, default=5000)
    ap.add_argument("--vocab", type=int, default=9487)
    ap.add_argument("--feat", type=int, default=2048)
    ap.add_argument("--no-upload", action="store_true",
                    help="skip the device-upload step (CPU-only hosts)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu) for the upload step")
    args = ap.parse_args()

    results: dict = {"n_images": args.n_train + args.n_val + args.n_test,
                     "feat_dim": args.feat}
    copts = generate(args.data, args.n_train, args.n_val, args.n_test,
                     args.vocab, args.feat)

    from nes_img_captioning_tpu.data.mscoco import CocoData

    fc_dir = copts["input_fc_dir"]
    cache = fc_dir.rstrip("/") + "_fc.npy"
    for p in (cache, fc_dir.rstrip("/") + "_ids.npy"):
        if os.path.isfile(p):
            os.remove(p)  # force a cold consolidation

    r0 = rss_gb()
    t0 = time.time()
    data = CocoData(copts)
    results["cold_load_s"] = round(time.time() - t0, 1)
    results["cold_load_rss_gb"] = round(rss_gb() - r0, 2)
    results["consolidated_cache_gb"] = round(os.path.getsize(cache) / 2**30, 2)
    assert data._fc.shape == (results["n_images"], args.feat)
    log(f"cold load (113k .npy reads -> consolidation): "
        f"{results['cold_load_s']}s, +{results['cold_load_rss_gb']} GB RSS, "
        f"cache {results['consolidated_cache_gb']} GB")
    del data

    r0 = rss_gb()
    t0 = time.time()
    data = CocoData(copts)
    results["warm_load_s"] = round(time.time() - t0, 2)
    results["warm_load_rss_gb"] = round(rss_gb() - r0, 2)
    assert isinstance(data._fc, np.memmap)
    log(f"warm load (mmap): {results['warm_load_s']}s, "
        f"+{results['warm_load_rss_gb']} GB RSS")

    # materializing the train split view (the array the task uploads)
    t0 = time.time()
    train = data.split_feats("train")
    results["train_matrix_gb"] = round(train.nbytes / 2**30, 2)
    results["split_view_s"] = round(time.time() - t0, 1)
    log(f"train split materialization: {results['split_view_s']}s "
        f"({results['train_matrix_gb']} GB)")

    if not args.no_upload:
        import jax

        if args.platform:
            jax.config.update("jax_platforms", args.platform)
        dev = jax.devices()[0]
        results["device"] = str(dev)
        t0 = time.time()
        train_dev = jax.device_put(train, dev)
        train_dev.block_until_ready()
        # honest sync through the tunnel: a tiny device->host pull
        _ = float(train_dev[0, 0])
        upload_s = max(time.time() - t0, 1e-3)
        results["upload_s"] = round(upload_s, 3)
        results["upload_gb_per_s"] = round(
            results["train_matrix_gb"] / upload_s, 2
        )
        try:
            ms = dev.memory_stats()
            results["hbm_in_use_gb"] = round(ms["bytes_in_use"] / 2**30, 2)
        except Exception:
            pass
        log(f"device upload: {results['upload_s']}s "
            f"({results['upload_gb_per_s']} GB/s) to {dev}")
        del train_dev

    # epoch sampling at the true mscoco_nes regime: 2000 pairs x batch 64
    from nes_img_captioning_tpu.data.core import EpochSampler

    sampler = EpochSampler(args.n_train, seed=0)
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        idx = sampler.member_batches(2000, 64)
    results["member_batches_ms"] = round((time.time() - t0) / reps * 1e3, 1)
    assert idx.shape == (2000, 64) and idx.max() < args.n_train
    log(f"member_batches(2000, 64) at train_n={args.n_train}: "
        f"{results['member_batches_ms']} ms/generation")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
