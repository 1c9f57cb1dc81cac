"""CLI surface: produce -> consume -> dashboard (reference program parity)."""

from __future__ import annotations

import os

from reddit_sentiment_spark_streaming_pipeline_spark.__main__ import main


def test_cli_pipeline_file_mode(spark, sf_dir, tmp_path, capsys):
    wire = str(tmp_path / "wire")
    out = str(tmp_path / "out")
    assert main(["produce", "--sf-dir", sf_dir, "--out", wire, "--chunks", "2"]) == 0
    assert len(os.listdir(wire)) >= 2
    assert main(["consume", "--wire", wire, "--out", out]) == 0
    for table in ("raw", "processed", "sentiment", "subreddit_stats", "references"):
        assert os.path.isdir(os.path.join(out, table))
    assert main(["dashboard", "--out", out, "-n", "3"]) == 0
    shown = capsys.readouterr().out
    assert "latest posts" in shown and "subreddit stats" in shown


def test_cli_list_names_every_query(capsys):
    from reddit_sentiment_spark_streaming_pipeline_spark import registry

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in registry.load_all():
        assert name in out


def test_cli_gate_drains_and_reports(spark, sf_dir, tmp_path, capsys):
    chunks = str(tmp_path / "doc_chunks")
    out = str(tmp_path / "gate_out")
    assert main(["gate", "--sf-dir", sf_dir, "--chunks-dir", chunks,
                 "--chunks", "3", "--out", out]) == 0
    assert os.path.isdir(os.path.join(out, "fingerprint_store"))
    shown = capsys.readouterr().out
    assert "n_admitted" in shown and "n_rejected" in shown


def test_cli_ingest_drains_and_reports(spark, sf_dir, tmp_path, capsys):
    chunks = str(tmp_path / "ingest_chunks")
    out = str(tmp_path / "ingest_out")
    assert main(["ingest", "--sf-dir", sf_dir, "--chunks-dir", chunks,
                 "--chunks", "3", "--out", out]) == 0
    for store in ("exact_store", "neardup_store", "ingest_results", "dsir_model"):
        assert os.path.isdir(os.path.join(out, store))
    shown = capsys.readouterr().out
    assert "n_exact_ok" in shown and "n_neardup_ok" in shown and "n_kept" in shown
