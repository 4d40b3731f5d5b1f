"""CSV logger versioning, model analysis, memory logger smoke tests."""

import os

import numpy as np

from gaviko_tpu.utils.logging import (
    CSVLogger,
    MemoryUsageLogger,
    TRAIN_LOG_FIELDS,
    analyze_model_computation,
)


def test_csv_logger_versioned_filenames(tmp_path):
    a = CSVLogger(str(tmp_path), "runlog", fields=["a", "b"])
    b = CSVLogger(str(tmp_path), "runlog", fields=["a", "b"])
    assert a.get_file_path().endswith("runlog_v1.csv")
    assert b.get_file_path().endswith("runlog_v2.csv")
    a.log({"a": 1, "b": 2})
    a.log({"a": 3, "b": 4})
    lines = open(a.get_file_path()).read().strip().splitlines()
    assert lines == ["a,b", "1,2", "3,4"]


def test_train_log_fields_match_reference():
    # ref: train.py:85-88 — the 15-field contract.
    assert len(TRAIN_LOG_FIELDS) == 15
    assert TRAIN_LOG_FIELDS[0] == "epoch"
    assert "time_stamp" in TRAIN_LOG_FIELDS


def test_analyze_model_computation_values():
    r = analyze_model_computation(1_000_000, flops=2_000_000_000, verbose=False)
    assert r["parameters_millions"] == 1.0
    assert abs(r["memory_mb"]["fp32"] - 1_000_000 * 4 / 2**20) < 0.1
    assert r["gflops"] == 2.0


def test_memory_logger_smoke():
    m = MemoryUsageLogger(verbose=True)
    m.index = 0
    m.display_before_forward_pass()
    m.display_after_optimization_step()
    m.index = 1  # non-first step: silent
    m.display_after_forward_pass()
