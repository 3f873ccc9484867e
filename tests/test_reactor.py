"""Reactor-surface tests: message validation, end-to-end dispatch,
CSV export, CLI summary."""

import json

import numpy as np
import pytest

from fcs_etl_reactor_spark.reactor import handle_message, validate_message
from fcs_etl_reactor_spark.sources.fcs import make_fcs_bytes

CHANNELS = ["FSC-A", "SSC-A", "FL1-A"]


@pytest.fixture(scope="module")
def spool(tmp_path_factory):
    d = tmp_path_factory.mktemp("reactor_fcs")
    rng = np.random.default_rng(7)
    for name in ("s1.fcs", "s2.fcs"):
        mat = rng.uniform(1.0, 1000.0, size=(50, 3))
        (d / name).write_bytes(make_fcs_bytes(CHANNELS, mat))
    return str(d)


class TestValidate:
    def test_valid_minimal(self):
        assert validate_message({"fcs_dir": "/x", "channels": CHANNELS}) == []

    def test_all_errors_collected(self):
        errs = validate_message(
            {
                "channels": [],
                "spillover_inverse": [[1.0]],
                "calibration": {"NOPE": [1]},
                "output_dir": 7,
            }
        )
        # missing fcs_dir, bad channels, bad matrix shape, unknown
        # calibration channel, bad calibration pair, bad output_dir
        assert len(errs) >= 5

    def test_invalid_message_raises(self, spark):
        with pytest.raises(ValueError, match="invalid message"):
            handle_message(spark, {"channels": CHANNELS})


class TestDispatch:
    def test_end_to_end_with_export(self, spark, spool, tmp_path):
        ident = [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]
        msg = {
            "fcs_dir": spool,
            "channels": CHANNELS,
            "spillover_inverse": ident,
            "calibration": {"FL1-A": [2.0, 0.0]},
            "output_dir": str(tmp_path / "out"),
        }
        res = handle_message(spark, msg)
        assert set(res["outputs"]) == {"point_cloud", "stats", "histogram"}
        pc = res["outputs"]["point_cloud"]
        assert pc.count() == 100  # 2 samples × 50 events
        stats = res["outputs"]["stats"].collect()
        assert {r["channel"] for r in stats} == set(CHANNELS)
        assert len(res["written"]) == 3
        # the exported stats CSV is readable and row-complete
        back = spark.read.option("header", "true").csv(
            str(tmp_path / "out" / "stats")
        )
        assert back.count() == len(stats)

    def test_cli_main_prints_summary(self, spool, tmp_path, capsys):
        from fcs_etl_reactor_spark.reactor import main

        msg_path = tmp_path / "msg.json"
        msg_path.write_text(
            json.dumps({"fcs_dir": spool, "channels": CHANNELS})
        )
        assert main([str(msg_path)]) == 0
        line = capsys.readouterr().out.strip().splitlines()[-1]
        summary = json.loads(line)
        assert summary["outputs"]["point_cloud"] == 100
        assert summary["written"] == []
