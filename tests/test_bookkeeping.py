"""Unit tests: podium, statistics checkpoint roundtrip, config parsing,
optimizer .tar interop, iteration annealing."""

import os

import numpy as np
import pytest

from nes_img_captioning_tpu.algorithms.podium import Podium
from nes_img_captioning_tpu.algorithms.statistics import Statistics
from nes_img_captioning_tpu.utils.config import (
    Config,
    load_experiment,
    parse_config,
    parse_tpu_config,
)


def _touch(path, content=b"x"):
    with open(path, "wb") as f:
        f.write(content)
    return path


class TestPodium:
    def test_keeps_top_e_and_flags_good_generations(self, tmp_path):
        pod = Podium(patience=2, directory=str(tmp_path), num_elites=2)
        a = _touch(str(tmp_path / "a.pth"))
        b = _touch(str(tmp_path / "b.pth"))
        c = _touch(str(tmp_path / "c.pth"))

        pod.record_elites([(a, 1.0), (b, 3.0)])
        assert not pod.is_bad_generation()  # new entrants -> good
        scores = [s for _, s in pod.best_elites()]
        assert scores == [3.0, 1.0]

        pod.record_elites([(c, 0.5)])  # doesn't beat the podium
        assert pod.is_bad_generation()

        pod.record_elites([(c, 5.0)])
        assert not pod.is_bad_generation()
        assert [s for _, s in pod.best_elites()] == [5.0, 3.0]
        # podium dir holds exactly the E best files
        files = os.listdir(str(tmp_path / "best_elite"))
        assert len(files) == 2

    def test_missing_file_candidates_ignored(self, tmp_path):
        pod = Podium(patience=0, directory=str(tmp_path), num_elites=1)
        pod.record_elites([(str(tmp_path / "ghost.pth"), 9.0)])
        # copy fails -> logged, stays bad
        assert pod.is_bad_generation()

    def test_scoreboard_always_capacity_sized(self, tmp_path):
        """Below capacity, unfilled slots must stay visible as empty —
        NESMaster._podium_would_take decides whether to rewrite the
        current-model file by looking at the slots, so a shrunken list
        would archive stale bytes under a lower score."""
        pod = Podium(patience=0, directory=str(tmp_path), num_elites=2)
        assert len(pod.best_elites()) == 2
        a = _touch(str(tmp_path / "a.pth"))
        pod.record_elites([(a, 0.6)])
        slots = pod.best_elites()
        assert len(slots) == 2
        assert slots[0][1] == 0.6
        assert not slots[1][0]  # second slot visibly empty
        # the would-take predicate (mirrors NESMaster._podium_would_take)
        assert any((not p) or 0.55 > s for p, s in slots)


class TestStatistics:
    def test_roundtrip(self):
        s = Statistics()
        s.record_score_stats(np.array([1.0, 2.0, 3.0]))
        s.record_acc_stats(0.5)
        s.record_best_acc_stats(0.6)
        s.record_norm_stats(np.array([1.0, -1.0]))
        s.record_std_stats(0.01)
        s.record_bs_stats(64)
        s.record_update_ratio(0.002)
        s.set_step_tstart()
        s.record_step_time_stats()
        s.update_mem_stats()

        d = s.to_dict()
        for key in ("score_stats", "score_stds", "time_stats", "acc_stats",
                    "norm_stats", "noise_std_stats", "bs_stats", "mem_stats",
                    "update_ratio_stats", "time_elapsed",
                    "best_acc_so_far_stats"):
            assert key in d, key

        s2 = Statistics()
        s2.init_from_infos(d)
        assert s2.to_dict()["score_stats"] == d["score_stats"]
        assert s2.to_dict()["norm_stats"] == [1.0]

    def test_plot_writes_pdfs(self, tmp_path):
        s = Statistics()
        s.record_score_stats(np.array([1.0, 2.0]))
        s.record_acc_stats(0.5)
        s.record_best_acc_stats(0.5)
        s.record_norm_stats(np.ones(3))
        s.record_std_stats(0.1)
        s.record_bs_stats(8)
        s.set_step_tstart()
        s.record_step_time_stats()
        s.update_mem_stats()
        s.plot_stats(str(tmp_path))
        assert (tmp_path / "loss_plot.pdf").exists()
        assert (tmp_path / "noise_std_plot.pdf").exists()


class TestConfig:
    def test_underscore_keys_disabled(self, tmp_path):
        import json

        exp = {
            "algorithm": "nic_nes",
            "config": {"batch_size": 4, "_patience": 5},
            "_from_infos": "stale.json",
            "from_single": None,
        }
        p = tmp_path / "e.json"
        p.write_text(json.dumps(exp))
        loaded = load_experiment(str(p))
        assert "_from_infos" not in loaded
        cfg = parse_config(loaded)
        assert cfg.batch_size == 4 and cfg.patience is None

    def test_unknown_config_key_rejected(self):
        with pytest.raises(ValueError, match="unknown config keys"):
            parse_config({"config": {"batchsize": 4}})

    def test_tpu_section(self):
        t = parse_tpu_config({"tpu": {"pop_chunk": 8, "mesh_shape": [4, 2]}})
        assert t.pop_chunk == 8 and t.mesh_shape == (4, 2)
        assert parse_tpu_config({}).fused_decode == "auto"

    def test_fused_knob_spellings_validated(self):
        # the gates test `is not False`: near-miss spellings (0, "false")
        # would silently leave the fused paths ON — parse must reject them
        for knob in ("fused_es", "fused_validation"):
            for good in (True, False, "auto"):
                assert getattr(
                    parse_tpu_config({"tpu": {knob: good}}), knob) == good
            for bad in (0, 1, "false", "true", "off", None):
                with pytest.raises(ValueError, match=knob):
                    parse_tpu_config({"tpu": {knob: bad}})


class TestOptimizerTar:
    def test_adam_tar_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from nes_img_captioning_tpu.algorithms.optimizers import Adam

        opt = Adam(0.01)
        st = opt.init(16)
        st, theta, _ = opt.step(st, jnp.ones(16), jnp.full(16, 0.5), 0.01)
        path = str(tmp_path / "optimizer.tar")
        opt.save_to_file(st, 16, path)

        opt2 = Adam(999.0)
        st2 = opt2.load_from_file(path)
        assert opt2.stepsize == 0.01  # stepsize restored from the tar
        np.testing.assert_allclose(np.asarray(st2.m), np.asarray(st.m))
        np.testing.assert_allclose(np.asarray(st2.v), np.asarray(st.v))
        assert int(st2.t) == 1
        # keys match the reference .tar schema (optimizers.py:85-107)
        import torch

        d = torch.load(path, weights_only=False)
        assert set(d) == {"dim", "t", "stepsize", "beta1", "beta2",
                          "epsilon", "m", "v"}

    def test_sgd_matches_reference_numerics(self):
        import jax.numpy as jnp

        from nes_img_captioning_tpu.algorithms.optimizers import SGD

        opt = SGD(0.1, momentum=0.9)
        st = opt.init(3)
        theta = jnp.array([1.0, 2.0, 3.0])
        g = jnp.array([1.0, 0.0, -1.0])
        st, theta1, ratio = opt.step(st, theta, g, 0.1)
        # v = 0.1*g ; step = -0.1*v
        np.testing.assert_allclose(
            np.asarray(theta1), [1.0 - 0.01, 2.0, 3.0 + 0.01], rtol=1e-6
        )
        expected_ratio = np.linalg.norm([0.01, 0, 0.01]) / np.linalg.norm([1, 2, 3])
        np.testing.assert_allclose(float(ratio), expected_ratio, rtol=1e-5)


class TestIterationAnnealing:
    def _it(self, tmp_path, **cfg):
        from nes_img_captioning_tpu.algorithms.iteration import Iteration

        config = Config(noise_stdev=0.1, batch_size=8, stdev_divisor=2.0,
                        bs_multiplier=2.0, patience=cfg.pop("patience", 0),
                        schedule_limit=cfg.pop("schedule_limit", None),
                        schedule_start=cfg.pop("schedule_start", 0))
        exp = {"nb_offspring": 4, "num_elites": 1,
               "log_dir": str(tmp_path)}
        return Iteration(config, exp)

    def test_schedule_annealing(self, tmp_path):
        it = self._it(tmp_path, schedule_limit=3, schedule_start=0)
        for _ in range(2):
            it.incr_iteration()
        assert it.noise_stdev() == 0.1
        it.incr_iteration()  # iteration 3: (3-0) % 3 == 0 -> anneal
        assert it.schedule_reached()
        assert it.noise_stdev() == 0.05
        assert it.batch_size() == 16

    def test_patience_annealing(self, tmp_path, monkeypatch):
        it = self._it(tmp_path, patience=1)
        it.incr_iteration()
        # no podium improvement for patience+1 generations -> curriculum step
        for i in range(2):
            it.process_evaluated_elites()  # empty evals -> bad generation
        assert it.patience_reached()
        assert it.noise_stdev() == 0.05


def test_zero_elite_config_rejected(tmp_path):
    """num_elites=0 would give the podium zero slots and crash both
    masters' BestEliteAcc stat on generation 1 (the reference reads
    best_elites()[0] unconditionally too) — rejected at construction."""
    import pytest

    from nes_img_captioning_tpu.algorithms.iteration import Iteration
    from nes_img_captioning_tpu.utils.config import Config

    exp = {"num_elites": 0, "nb_offspring": 4,
           "log_dir": str(tmp_path / "run")}
    with pytest.raises(ValueError, match="num_elites"):
        Iteration(Config(batch_size=4), exp)
