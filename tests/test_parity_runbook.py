"""The real-data parity runbook's gate (docs/PARITY.md, VERDICT r4 dir. 4).

Two layers:
  * the synthetic-fixture test ALWAYS runs — it drives the exact
    scripts/parity_run.py chain (bit-exact .pth warm start -> N generations
    -> validation CIDEr series -> eval_on_test) against the generated
    reference-format fixture, so the runbook's command cannot rot;
  * the real-data smoke test is gated on NES_COCO_DATA=<dir> (the MSCOCO
    artifacts do not exist in this image) and runs the same chain over the
    real files the day they exist.
"""

import importlib.util
import json
import os

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "parity_run",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "parity_run.py"),
)
parity_run = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(parity_run)


def _tiny_exp(path: str, fc_feat_size: int):
    """mscoco_nes.json shrunk to fixture scale (same schema/knobs)."""
    exp = {
        "algorithm": "nic_nes",
        "config": {
            "eval_prob": 0.003, "noise_stdev": 0.01, "snapshot_freq": 2,
            "batch_size": 8, "val_batch_size": 8, "num_val_items": 8,
            "patience": 0, "schedule_start": 1000, "schedule_limit": 1000,
            "stdev_divisor": 1, "bs_multiplier": 1, "stepsize_divisor": 1,
            "l2coeff": 1e-7, "single_batch": False,
        },
        "policy_options": {
            "net": "fc_caption", "fitness": "greedy", "vbn": False,
            "model_options": {
                "safe_mutations": "",
                "input_encoding_size": 16, "rnn_size": 16,
                "fc_feat_size": fc_feat_size,
            },
        },
        "optimizer_options": {"type": "adam", "args": {"stepsize": 0.001}},
        "dataset": "mscoco",
        "nb_offspring": 4,
        "num_elites": 1,
        "caption_options": {},
        "tpu": {"seed": 0},
    }
    with open(path, "w") as f:
        json.dump(exp, f)
    return exp


def test_parity_driver_on_synthetic_fixture(tmp_path):
    """docs/PARITY.md §2's command end-to-end on the synthetic fixture:
    warm-start round trip, 2 generations, val series, test eval, summary
    JSON on disk."""
    import jax

    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.models.fc_caption import (
        FCCaptionModel,
        FCModelOptions,
    )

    data_dir = str(tmp_path / "data")
    make_synthetic_coco(data_dir, n_train=32, n_val=8, n_test=8,
                        vocab_size=40, fc_feat_size=16)

    # a 'pretrained' reference-format .pth at the fixture dims
    model = FCCaptionModel(FCModelOptions(
        vocab_size=40, seq_length=16, input_encoding_size=16, rnn_size=16,
        fc_feat_size=16,
    ))
    theta0 = np.asarray(model.spec.init_theta(jax.random.PRNGKey(3)))
    pth = str(tmp_path / "warm.pth")
    model.spec.save_pth(theta0, pth)

    exp_path = str(tmp_path / "tiny_nes.json")
    _tiny_exp(exp_path, fc_feat_size=16)
    out_dir = str(tmp_path / "out")

    summary = parity_run.main([
        "--data", data_dir, "--pth", pth, "--exp", exp_path,
        "--generations", "2", "--test-num", "8", "--out", out_dir,
    ])

    assert summary["warm_start"]["vector_roundtrip_exact"]
    assert summary["warm_start"]["tensor_roundtrip_exact"]
    assert len(summary["val_cider_series"]) == 2
    assert all(np.isfinite(v) for v in summary["val_cider_series"])
    assert len(summary["train_fitness_mean_series"]) == 2
    assert summary["test_stats"] is not None
    for name, stats in summary["test_stats"].items():
        assert np.isfinite(stats["CIDEr"]), (name, stats)
    with open(os.path.join(out_dir, "parity_summary.json")) as f:
        assert json.load(f)["generations"] == 2
    assert os.path.isfile(os.path.join(out_dir, "test_output.json"))


def test_parity_driver_threads_cider_df(tmp_path):
    """--cider-df reaches the training scorers through the driver (absolute
    fitness scale flips with the table's ref_len)."""
    import pickle

    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.fitness.ciderd import CiderScorer

    data_dir = str(tmp_path / "data")
    make_synthetic_coco(data_dir, n_train=32, n_val=8, n_test=8,
                        vocab_size=40, fc_feat_size=16)
    exp_path = str(tmp_path / "tiny_nes.json")
    _tiny_exp(exp_path, fc_feat_size=16)

    # frozen table over the fixture's own train gts but an alien ref_len:
    # same ranks, shifted absolute scale
    from nes_img_captioning_tpu.data.mscoco import CocoData

    copts = {
        "input_json": os.path.join(data_dir, "cocotalk.json"),
        "input_label_h5": os.path.join(data_dir, "cocotalk_label.h5"),
        "input_fc_dir": os.path.join(data_dir, "fc"),
    }
    gts = CocoData(copts).split_gts("train")
    fitted = CiderScorer(variant="cider-d").fit_df(gts)
    doc_freq = {tuple(str(t) for t in g): float(c)
                for order in fitted.df for g, c in order.items()}
    df_path = str(tmp_path / "coco-train-idxs.p")
    with open(df_path, "wb") as f:
        pickle.dump({"document_frequency": doc_freq,
                     "ref_len": float(np.log(40504.0))}, f, protocol=2)

    base = parity_run.main([
        "--data", data_dir, "--exp", exp_path, "--generations", "1",
        "--skip-test-eval", "--out", str(tmp_path / "o1"),
    ])
    frozen = parity_run.main([
        "--data", data_dir, "--exp", exp_path, "--generations", "1",
        "--cider-df", df_path, "--skip-test-eval",
        "--out", str(tmp_path / "o2"),
    ])
    b = base["train_fitness_mean_series"][0]
    z = frozen["train_fitness_mean_series"][0]
    # ref_len log(40504) vs log(32): frozen-table idfs are ~7x larger
    assert z > b * 2, (b, z)


@pytest.mark.skipif(not os.environ.get("NES_COCO_DATA"),
                    reason="set NES_COCO_DATA=<dir with cocotalk.json/"
                           "cocotalk_label.h5/fc features> to smoke-test "
                           "the parity chain on real MSCOCO data")
def test_parity_real_data_smoke(tmp_path):
    """2 tiny generations + a 32-image test eval over the REAL artifacts
    (docs/PARITY.md §4). Uses the full-size model dims from
    experiments/mscoco_nes.json but a shrunk population so it finishes in
    minutes on CPU."""
    data_dir = os.environ["NES_COCO_DATA"]
    argv = [
        "--data", data_dir, "--generations", "2",
        "--nb-offspring", "4", "--batch-size", "8", "--val-items", "64",
        "--test-num", "32", "--out", str(tmp_path / "out"),
    ]
    pth = os.path.join(data_dir, "bu_xent_09.pth")
    if os.path.isfile(pth):
        argv += ["--pth", pth]
    df = os.path.join(data_dir, "coco-train-idxs.p")
    if os.path.isfile(df):
        argv += ["--cider-df", df]
    summary = parity_run.main(argv)
    assert len(summary["val_cider_series"]) == 2
    assert all(np.isfinite(v) for v in summary["val_cider_series"])
    assert summary["test_stats"] is not None
