"""Dataloader-position restore on resume.

The reference does NOT checkpoint dataloader position — after a from_infos
resume its loaders restart at position 0 (src/captioning/dataloader.py:238-240,
the iterators are rebuilt in tools/experiment.py). This framework closes
that gap with an ADDITIVE sidecar (z_loader_state.json, written next to the
reference-format z_info by algorithms/snapshot.save_snapshot): the z_info
schema itself stays bit-compatible, and a resume continues the exact epoch
index stream.
"""

import glob
import json
import os

import numpy as np
import pytest

from nes_img_captioning_tpu.data.core import EpochSampler, build_sampler

from test_train_mnist import _mnist_exp


def test_epoch_sampler_state_roundtrip_continues_stream():
    """state_dict -> JSON -> from_state_dict reproduces the live permutation,
    the position in it, and the rng continuation (wraps + member_batches)."""
    a = EpochSampler(13, seed=42)
    # advance into the second epoch and past a member_batches rng draw
    for _ in range(4):
        a.batch(5)  # wraps after 2 draws (13 // 5)
    a.member_batches(3, 4)

    state = json.loads(json.dumps(a.state_dict()))  # must survive JSON
    b = EpochSampler.from_state_dict(state)

    for _ in range(6):  # crosses another wrap: perm redraw must match too
        np.testing.assert_array_equal(a.batch(5), b.batch(5))
    np.testing.assert_array_equal(a.member_batches(2, 6),
                                  b.member_batches(2, 6))


def test_build_sampler_ignores_mismatched_sidecar(caplog):
    import logging

    a = EpochSampler(10, seed=1)
    state = a.state_dict()
    rng = np.random.default_rng(0)
    with caplog.at_level(logging.WARNING):
        s = build_sampler(20, rng, state)  # dataset size changed
    assert s.n == 20
    assert "fresh epoch stream" in caplog.text

    # matching n restores
    s2 = build_sampler(10, np.random.default_rng(0), state)
    np.testing.assert_array_equal(s2.batch(4), a.batch(4))


def test_build_sampler_survives_corrupt_sidecar(caplog):
    """A hand-edited/corrupt sidecar (missing keys, foreign BitGenerator
    state) must degrade to a fresh stream, not abort the whole resume
    (ADVICE r4)."""
    import logging

    rng = np.random.default_rng(0)
    for bad in (
        {"n": 10},  # missing pos/perm_rng_state/rng_state
        {"n": 10, "pos": 0, "perm_rng_state": {"bit_generator": "MT19937"},
         "rng_state": {"bit_generator": "MT19937"}},  # foreign generator
    ):
        caplog.clear()
        with caplog.at_level(logging.WARNING):
            s = build_sampler(10, rng, bad)
        assert s.n == 10
        assert "fresh epoch stream" in caplog.text


def test_sidecar_stamp_guards_torn_snapshot(tmp_path):
    """The sidecar is stamped with its z_info filename; a crash between the
    z_info write and the sidecar write leaves the PREVIOUS sidecar next to
    the new z_info — load_loader_state must reject the pair instead of
    silently rewinding the batch stream (ADVICE r4)."""
    from nes_img_captioning_tpu.algorithms.snapshot import (
        LOADER_STATE_FILE, load_loader_state)

    d = tmp_path
    zinfo = os.path.join(d, "z_info_e0_i7-100.json")
    with open(zinfo, "w") as f:
        json.dump({}, f)
    state = EpochSampler(10, seed=3).state_dict()

    # matching stamp: restored, stamp stripped
    with open(os.path.join(d, LOADER_STATE_FILE), "w") as f:
        json.dump({**state, "z_info": "z_info_e0_i7-100.json"}, f)
    got = load_loader_state(zinfo)
    assert got is not None and "z_info" not in got
    assert int(got["pos"]) == int(state["pos"])

    # stale stamp from the previous snapshot: rejected
    with open(os.path.join(d, LOADER_STATE_FILE), "w") as f:
        json.dump({**state, "z_info": "z_info_e0_i5-100.json"}, f)
    assert load_loader_state(zinfo) is None

    # unstamped (pre-fix sidecar): still accepted for back-compat
    with open(os.path.join(d, LOADER_STATE_FILE), "w") as f:
        json.dump(state, f)
    assert load_loader_state(zinfo) is not None


def test_save_snapshot_stamps_and_replaces_atomically(tmp_path):
    """save_snapshot writes the sidecar via temp-file + os.replace and
    stamps it with the z_info filename it pairs with."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    from nes_img_captioning_tpu.algorithms.snapshot import (
        LOADER_STATE_FILE, save_snapshot)

    exp = _mnist_exp("nic_nes", str(tmp_path / "run"))
    m = NESMaster(exp)
    m._draw_batches(2, 4)  # materialize the sampler
    path = save_snapshot(m.stats, m.it, m.experiment,
                         loader_state=m.loader_state())
    side = os.path.join(os.path.dirname(path), LOADER_STATE_FILE)
    with open(side) as f:
        payload = json.load(f)
    assert payload["z_info"] == os.path.basename(path)
    assert not os.path.exists(side + ".tmp")


def test_nes_resume_continues_batch_stream(tmp_path):
    """A from_infos NES resume draws the same next batches the interrupted
    master would have drawn (the reference restarts its loader instead)."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _mnist_exp("nic_nes", str(tmp_path / "run1"))
    m1 = NESMaster(exp)
    m1.run_master(max_iterations=2)
    snap_dir = str(tmp_path / "run1" / "snapshot")
    assert os.path.isfile(os.path.join(snap_dir, "z_loader_state.json"))
    zinfo = glob.glob(os.path.join(snap_dir, "z_info_*.json"))[0]

    exp2 = _mnist_exp("nic_nes", str(tmp_path / "run2"))
    exp2["from_infos"] = zinfo
    m2 = NESMaster(exp2)
    assert m2._pending_loader_state == m1.loader_state()

    F, bs = 4, 8
    np.testing.assert_array_equal(m1._draw_batches(F, bs),
                                  m2._draw_batches(F, bs))
    np.testing.assert_array_equal(m1._draw_batches(F, bs),
                                  m2._draw_batches(F, bs))


def test_es_resume_carries_loader_state(tmp_path):
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _mnist_exp("nic_es", str(tmp_path / "run1"))
    m1 = ESMaster(exp)
    m1.run_master(max_iterations=2)
    snap_dir = str(tmp_path / "run1" / "snapshot")
    assert os.path.isfile(os.path.join(snap_dir, "z_loader_state.json"))
    zinfo = glob.glob(os.path.join(snap_dir, "z_info_*.json"))[0]

    exp2 = _mnist_exp("nic_es", str(tmp_path / "run2"))
    exp2["from_infos"] = zinfo
    m2 = ESMaster(exp2)
    assert m2._pending_loader_state == m1.loader_state()
    # the restored sampler continues m1's stream
    s2 = build_sampler(m2.task.train_n, m2._rng, m2._pending_loader_state)
    np.testing.assert_array_equal(s2.batch(8), m1._sampler.batch(8))


def test_sidecar_removed_when_no_live_sampler(tmp_path):
    """A snapshot taken before any batch draw must clear a stale sidecar —
    resuming from it with an older stream position would replay data."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    from nes_img_captioning_tpu.algorithms.snapshot import save_snapshot

    exp = _mnist_exp("nic_nes", str(tmp_path / "run"))
    m = NESMaster(exp)
    snap_dir = m.experiment.snapshot_dir()
    os.makedirs(snap_dir, exist_ok=True)
    stale = os.path.join(snap_dir, "z_loader_state.json")
    with open(stale, "w") as f:
        json.dump({"n": 1, "pos": 0}, f)
    assert m.loader_state() is None  # no batches drawn yet
    save_snapshot(m.stats, m.it, m.experiment, loader_state=m.loader_state())
    assert not os.path.exists(stale)
