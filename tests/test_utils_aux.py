"""Tests for the auxiliary subsystems (SURVEY.md §5): profiling timer,
metrics registry, and experiment configs."""

import json
import os

import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.utils.logging import MetricsLogger
from gaussianprocessnode_tpu.utils.profiling import timed
from gaussianprocessnode_tpu.utils import configs


class TestTimed:
    def test_records_elapsed_and_blocks_on_results(self):
        res = {}
        with timed("work", results=res) as out:
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            out["block_on"] = x  # timer must block_until_ready before stopping
        assert "work" in res and res["work"] >= 0.0
        np.testing.assert_allclose(np.asarray(x)[0, 0], 64.0)

    def test_default_label(self):
        res = {}
        with timed(results=res):
            pass
        assert "elapsed" in res


class TestMetricsLogger:
    def test_log_last_summary_roundtrip(self, tmp_path):
        m = MetricsLogger()
        for step, fe in enumerate([3.0, 2.0, 1.5]):
            m.log("fe", fe, step=step)
        m.log("smse", 0.08)
        assert m.last("fe") == 1.5
        assert m.summary() == {"fe": 1.5, "smse": 0.08}

        jpath = os.path.join(tmp_path, "m.json")
        cpath = os.path.join(tmp_path, "m.csv")
        m.to_json(jpath)
        m.to_csv(cpath)
        loaded = json.load(open(jpath))
        assert [r["value"] for r in loaded["fe"]] == [3.0, 2.0, 1.5]
        lines = open(cpath).read().strip().split("\n")
        assert lines[0] == "name,step,t,value"
        assert len(lines) == 1 + 3 + 1

    def test_auto_step_numbering(self):
        m = MetricsLogger()
        m.log("a", 1.0)
        m.log("a", 2.0)
        assert [r["step"] for r in m.series["a"]] == [0, 1]


class TestConfigs:
    def test_configs_match_reference_notebook_constants(self):
        """The checked-in configs must carry the reference's exact settings
        (SURVEY.md §2.6 table) — these are what the experiments and parity
        tests key off."""
        k = configs.Kin40kConfig()
        assert (k.n_train, k.m_inducing, k.batch_size) == (10_000, 600, 500)
        assert k.w_fixed == 1e4 and k.reference_smse == 0.083431
        b = configs.BananaConfig()
        assert (b.n_train, b.m_inducing, b.batch_size) == (4000, 500, 200)
        assert b.reference_errors == 125
        p = configs.PendulumConfig()
        assert (p.n_train, p.m_inducing, p.epochs) == (300, 48, 150)
        assert p.reference_smse == (0.005455, 0.001077)
        t = configs.ToyRegressionConfig()
        assert (t.n_train, t.m_inducing, t.vmp_iters) == (50, 20, 7)
        g = configs.GPLVMConfig()
        assert (g.d_out, g.d_in, g.m_inducing) == (12, 2, 30)

    def test_configs_are_frozen(self):
        import dataclasses

        import pytest

        c = configs.Kin40kConfig()
        with pytest.raises(dataclasses.FrozenInstanceError):
            c.n_train = 1
