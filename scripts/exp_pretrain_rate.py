"""XENT pretrain throughput vs the reference's backprop baseline.

The reference trains its warm-start checkpoint with plain backprop XENT and
records 0.065 s/batch @ batch 16 on the author's dev machine
(`src/algorithm/tools/utils.py:177-178`; BASELINE.md). This probe times
`pretrain.pretrain_xent` on the chip at the reference batch size and at 256.

Run on the real chip:  python scripts/exp_pretrain_rate.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.pretrain import pretrain_xent
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    data_dir = os.environ.get("NES_BENCH_DATA", "/tmp/nes_bench_data")
    if not os.path.isfile(os.path.join(data_dir, "cocotalk.json")):
        make_synthetic_coco(data_dir, n_train=2048, n_val=256, n_test=256,
                            vocab_size=9487, fc_feat_size=2048, cap_len=9,
                            seed=0)
    exp = {
        "dataset": "mscoco",
        "caption_options": {
            "input_json": os.path.join(data_dir, "cocotalk.json"),
            "input_label_h5": os.path.join(data_dir, "cocotalk_label.h5"),
            "input_fc_dir": os.path.join(data_dir, "fc"),
        },
        "policy_options": {"fitness": "greedy", "model_options": {}},
    }
    task = CocoTask(exp, Config(batch_size=64), TpuConfig(seed=0))

    t0 = time.time()
    pretrain_xent(task, steps=20, lr=5e-4, batch_size=16, seed=0)
    warm = time.time() - t0
    rows = {"warmup_s": round(warm, 1)}
    for bs in (16, 256):
        t0 = time.time()
        pretrain_xent(task, steps=500, lr=5e-4, batch_size=bs, seed=1)
        rows[f"s_per_batch_b{bs}"] = round((time.time() - t0) / 500, 5)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
