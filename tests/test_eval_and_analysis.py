"""Tests: language metrics, eval_on_test, SM-VECTOR, analysis helpers."""

import json
import os

import numpy as np
import pytest

from nes_img_captioning_tpu.fitness.lang_metrics import (
    corpus_bleu,
    language_eval,
    rouge_l,
)


def _pad(toks, T=16):
    out = np.zeros(T, np.int32)
    out[: len(toks)] = toks
    return out


def test_bleu_perfect_and_zero():
    gts = [np.stack([_pad([1, 2, 3, 4])])]
    bleus = corpus_bleu([_pad([1, 2, 3, 4])], gts)
    np.testing.assert_allclose(bleus, [1.0] * 4, atol=1e-9)
    bleus = corpus_bleu([_pad([5, 6, 7, 8])], gts)
    assert bleus[0] == 0.0 and bleus[3] == 0.0


def test_bleu_brevity_penalty():
    gts = [np.stack([_pad([1, 2, 3, 4, 5, 6])])]
    short = corpus_bleu([_pad([1, 2, 3])], gts)[0]
    # unigram precision 1.0 but candidate len 3 vs ref 6 -> bp = e^{1-2}
    np.testing.assert_allclose(short, np.exp(1 - 6 / 3), atol=1e-9)


def test_rouge_l():
    gts = [np.stack([_pad([1, 2, 3, 4])])]
    assert rouge_l([_pad([1, 2, 3, 4])], gts) == pytest.approx(1.0)
    assert rouge_l([_pad([9, 9])], gts) == 0.0
    partial = rouge_l([_pad([1, 9, 3])], gts)  # lcs = 2
    prec, rec, beta = 2 / 3, 2 / 4, 1.2
    expected = (1 + beta**2) * prec * rec / (rec + beta**2 * prec)
    assert partial == pytest.approx(expected)


def test_language_eval_dict_shape():
    gts = [np.stack([_pad([1, 2, 3])]), np.stack([_pad([4, 5, 6])])]
    out = language_eval([_pad([1, 2, 3]), _pad([4, 5, 9])], gts)
    for k in ("Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr", "METEOR", "SPICE"):
        assert k in out
    assert out["CIDEr"] > 0
    assert 0.0 < out["METEOR"] <= 1.0  # native scorer (fitness/meteor.py)
    assert out["SPICE"] is None  # external scene-graph parser, absent
    # the caveats ride along with every score dict (README metrics table)
    assert set(out["metric_notes"]) == {"METEOR", "SPICE"}


def test_eval_on_test(tmp_path):
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.eval_on_test import evaluate_checkpoints
    from nes_img_captioning_tpu.models.fc_caption import (
        FCCaptionModel,
        FCModelOptions,
    )
    import jax

    copts = make_synthetic_coco(str(tmp_path / "d"), n_train=16, n_val=8,
                                n_test=8, vocab_size=20, fc_feat_size=32)
    model = FCCaptionModel(FCModelOptions(vocab_size=20, fc_feat_size=32,
                                          input_encoding_size=8, rnn_size=8))
    p1 = str(tmp_path / "m1.pth")
    p2 = str(tmp_path / "m2.pth")
    model.spec.save_pth(np.asarray(model.spec.init_theta(jax.random.PRNGKey(0))), p1)
    model.spec.save_pth(np.asarray(model.spec.init_theta(jax.random.PRNGKey(1))), p2)

    out = evaluate_checkpoints(
        {"nicnes": p1, "nices": p2}, copts, num=8,
        input_encoding_size=8, rnn_size=8, fc_feat_size=32,
    )
    assert set(out["stats"]) == {"nicnes", "nices"}
    assert "CIDEr" in out["stats"]["nicnes"]
    img = next(iter(out["preds_per_img"].values()))
    assert "gts" in img and "nicnes" in img and "nices" in img


def test_eval_on_test_cli(tmp_path):
    """The CLI surface (reference: src/eval_on_test.py run as a script):
    --model name=path args, output JSON written under --out."""
    import glob
    import json

    import jax

    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.eval_on_test import run
    from nes_img_captioning_tpu.models.fc_caption import (
        FCCaptionModel,
        FCModelOptions,
    )

    copts = make_synthetic_coco(str(tmp_path / "d"), n_train=16, n_val=8,
                                n_test=8, vocab_size=20, fc_feat_size=32)
    model = FCCaptionModel(FCModelOptions(vocab_size=20, fc_feat_size=32,
                                          input_encoding_size=8, rnn_size=8))
    pth = str(tmp_path / "ck.pth")
    model.spec.save_pth(
        np.asarray(model.spec.init_theta(jax.random.PRNGKey(0))), pth
    )
    out_dir = str(tmp_path / "out")
    run([
        "--model", f"nicnes={pth}",
        "--input_json", copts["input_json"],
        "--input_fc_dir", copts["input_fc_dir"],
        "--input_label_h5", copts["input_label_h5"],
        "--num", "8", "--out", out_dir,
        "--input_encoding_size", "8", "--rnn_size", "8",
        "--fc_feat_size", "32",
    ])
    files = glob.glob(out_dir + "/test_output_*.json")
    assert len(files) == 1
    with open(files[0]) as f:
        payload = json.load(f)
    assert set(payload) == {"stats", "preds_per_img", "preds_per_model"}
    assert isinstance(payload["stats"]["nicnes"]["METEOR"], float)


def test_sm_vector_wiring(tmp_path):
    """safe_mutations=SM-VECTOR loads the vector, clamps at underflow, and
    min-normalizes (reference: safe_mutations.py:28-32)."""
    import torch
    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    from nes_img_captioning_tpu.utils.config import load_experiment

    exp = load_experiment("experiments/mnist_nes.json")
    exp["log_dir"] = str(tmp_path / "run")
    exp["nb_offspring"] = 4
    exp["tpu"] = {"seed": 0}
    mo = exp["policy_options"]["model_options"]
    mo["safe_mutations"] = "SM-VECTOR"
    mo["safe_mutation_underflow"] = 0.5

    master0 = NESMaster({**exp, "policy_options": {
        **exp["policy_options"],
        "model_options": {**mo, "safe_mutations": ""}}})
    dim = master0.engine.dim
    vec = np.linspace(0.1, 2.0, dim).astype(np.float32)
    vec_path = str(tmp_path / "sens.pt")
    torch.save(torch.from_numpy(vec), vec_path)
    mo["safe_mutation_vector"] = vec_path

    master = NESMaster(exp)
    sens = np.asarray(master._sens)
    expected = np.maximum(vec, 0.5)
    expected = expected / expected.min()
    np.testing.assert_allclose(sens, expected, rtol=1e-6)
    master.run_master(max_iterations=1)  # trains with the vector


def test_dump_all_sensitivities(tmp_path):
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import dump_all_sensitivities
    from nes_img_captioning_tpu.tasks.classification import MnistTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig
    import jax
    import torch

    task = MnistTask({"policy_options": {}, "synthetic_sizes": [64, 32]},
                     Config(batch_size=16), TpuConfig(seed=0))
    theta = task.generate_theta(jax.random.PRNGKey(0))
    paths = dump_all_sensitivities(task, theta, 16, str(tmp_path / "sens"),
                                   MutationKind.SAFE_GRAD_SUM, 0.2)
    assert len(paths) == 4  # 64 items / batch 16
    v = torch.load(paths[0], weights_only=False)
    assert v.shape[0] == task.spec.num_params
    assert float(v.min()) >= 1.0


def test_analysis_helpers(tmp_path):
    from nes_img_captioning_tpu.utils.analysis import (
        combine_diff_lengths,
        combine_diff_lengths_pad,
        cst_from_infos,
        extract_stat_from_log,
        rasterize,
        readable_bytes,
        tournament_counts,
    )

    np.testing.assert_allclose(
        combine_diff_lengths([1, 2], [3, 4, 5]), [2.0, 3.0, 5.0]
    )
    np.testing.assert_allclose(
        combine_diff_lengths_pad([1, 2], [3, 4, 5]), [2.0, 3.0, 3.5]
    )

    infos = {"acc_stats": [0.1, 0.3, 0.2], "bs_stats": [4, 4, 4],
             "time_stats": [1.0, 1.0, 1.0]}
    ciders, samples, times = cst_from_infos(infos)
    np.testing.assert_allclose(ciders, [0.1, 0.3, 0.3])
    np.testing.assert_allclose(samples, [4, 8, 12])

    log = tmp_path / "log.txt"
    log.write_text("| RewStd:              |      0.085 |\n"
                   "| RewStd:              |      0.070 |\n")
    assert extract_stat_from_log(str(log), "RewStd") == [0.085, 0.07]

    (rx, _), (ry, _) = rasterize(
        [(0, 1.0), (2, 2.0), (4, 3.0)], [(0, 5.0), (1, 6.0), (2, 7.0)]
    )
    assert len(rx) == len(ry)

    assert readable_bytes(2048) == "2.0KB"

    counts = tournament_counts(10, 3, 1000, trials=3)
    assert counts[0] > counts[5] > counts[9]  # selection pressure decreasing


def test_profile_summary_tool(tmp_path, capsys):
    """scripts/profile_summary.py: finds the newest trace under a run dir
    and aggregates device-lane op durations (SURVEY §5.1 — the pstats
    recipe's equivalent for tpu.profile traces)."""
    import gzip
    import importlib.util
    import json
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "profile_summary",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "profile_summary.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    d = tmp_path / "run" / "profile" / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "name": "process_name", "pid": 3,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 9,
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 1500},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 500},
        {"ph": "X", "pid": 3, "name": "while.6", "dur": 3000},
        {"ph": "X", "pid": 9, "name": "host_thing", "dur": 99999},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    trace = mod.find_trace(str(tmp_path / "run"))
    lanes, rows, total = mod.summarize(trace)
    assert abs(total - 5.0) < 1e-9  # host lane excluded
    assert rows[0] == ("while.6", 3.0, 1)
    assert ("fusion.1", 2.0, 2) in rows

    mod.main([str(tmp_path / "run"), "-n", "5"])
    out = capsys.readouterr().out
    assert "while.6" in out and "host_thing" not in out
