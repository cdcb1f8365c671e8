"""SPICE external-tool hook (fitness/lang_metrics.spice_external).

The reference scores SPICE through the cococaption Java pipeline
(src/captioning/eval_utils.py:49-57) — absent from its own checkout too.
The hook restores the metric surface on hosts that have a SPICE jar: the
user supplies a command (caption_options.spice_cmd / --spice_cmd), we write
the jar's input JSON, run it, and parse its output. These tests drive the
hook with a stand-in subprocess tool.
"""

import json
import os
import stat
import sys

import numpy as np
import pytest

from nes_img_captioning_tpu.fitness.lang_metrics import (
    language_eval,
    spice_external,
)

ITEMS = [
    {"image_id": 1, "test": "a cat", "refs": ["a cat", "the cat"]},
    {"image_id": 2, "test": "a dog", "refs": ["a dog"]},
]


def _tool(tmp_path, body: str) -> str:
    """A stand-in 'SPICE jar': a python script taking (input, output) paths."""
    p = tmp_path / "fake_spice.py"
    p.write_text("import json, sys\n" + body)
    return f"{sys.executable} {p}"


def test_spice_external_jar_format(tmp_path):
    """Per-image jar output: mean of scores.All.f; input file carries the
    items verbatim."""
    cmd = _tool(tmp_path, """
items = json.load(open(sys.argv[1]))
assert [it["image_id"] for it in items] == [1, 2]
assert items[0]["refs"] == ["a cat", "the cat"]
out = [{"image_id": it["image_id"],
        "scores": {"All": {"f": 0.25 + 0.5 * i}}}
       for i, it in enumerate(items)]
json.dump(out, open(sys.argv[2], "w"))
""")
    assert spice_external(cmd, ITEMS) == pytest.approx(0.5)  # mean(.25, .75)


def test_spice_external_placeholder_template(tmp_path):
    """{input}/{output} placeholders substitute instead of appending."""
    cmd = _tool(tmp_path, """
items = json.load(open(sys.argv[1]))
json.dump({"SPICE": 0.125}, open(sys.argv[2], "w"))
""")
    assert spice_external(cmd + " {input} {output}", ITEMS) \
        == pytest.approx(0.125)


def test_spice_external_failure_reports_none(tmp_path, caplog):
    failing = _tool(tmp_path, "sys.exit(3)\n")
    assert spice_external(failing, ITEMS) is None
    assert spice_external("/nonexistent/spice-jar", ITEMS) is None
    garbage = _tool(tmp_path, "open(sys.argv[2], 'w').write('not json')\n")
    assert spice_external(garbage, ITEMS) is None


def test_language_eval_spice_wiring(tmp_path):
    cands = np.array([[1, 2, 0, 0]])
    gts = [np.array([[1, 2, 0, 0]])]
    # unset -> None, with the hook documented in the note
    out = language_eval(cands, gts)
    assert out["SPICE"] is None
    assert "spice_cmd" in out["metric_notes"]["SPICE"]
    # set -> parsed score, note says external tool
    cmd = _tool(tmp_path,
                'json.dump({"SPICE": 0.3}, open(sys.argv[2], "w"))\n')
    out = language_eval(cands, gts, spice_cmd=cmd,
                        spice_items=[{"image_id": 0, "test": "a",
                                      "refs": ["a"]}])
    assert out["SPICE"] == pytest.approx(0.3)
    assert "external tool" in out["metric_notes"]["SPICE"]


def test_eval_on_test_spice_cmd_end_to_end(tmp_path):
    """--spice_cmd flows from the CLI through evaluate_checkpoints into the
    per-model stats; the tool sees string captions with references."""
    import jax

    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.eval_on_test import evaluate_checkpoints
    from nes_img_captioning_tpu.models.fc_caption import (
        FCCaptionModel,
        FCModelOptions,
    )

    copts = make_synthetic_coco(str(tmp_path / "d"), n_train=16, n_val=8,
                                n_test=8, vocab_size=20, fc_feat_size=16)
    model = FCCaptionModel(FCModelOptions(
        vocab_size=20, input_encoding_size=8, rnn_size=8, fc_feat_size=16,
    ))
    theta = np.asarray(model.spec.init_theta(jax.random.PRNGKey(0)))
    pth = str(tmp_path / "m.pth")
    model.spec.save_pth(theta, pth)

    cmd = _tool(tmp_path, """
items = json.load(open(sys.argv[1]))
assert all(isinstance(it["test"], str) and isinstance(it["refs"], list)
           for it in items)
out = [{"image_id": it["image_id"], "scores": {"All": {"f": 0.2}}}
       for it in items]
json.dump(out, open(sys.argv[2], "w"))
""")
    res = evaluate_checkpoints(
        {"m": pth}, dict(copts, spice_cmd=cmd), num=4, split="test",
        batch_size=4, input_encoding_size=8, rnn_size=8, fc_feat_size=16,
    )
    assert res["stats"]["m"]["SPICE"] == pytest.approx(0.2)
