"""Unit tests for the scraper's dependency-free logic: CSV parsing,
bot-detection abort, manifest resume semantics."""

import subprocess
from unittest import mock

import pytest

from avatar_tpu.cli.scrape import (
    BotDetectionError,
    _read_avspeech_csv,
    run_yt_dlp,
)


def test_read_avspeech_csv(tmp_path):
    csv = tmp_path / "avspeech.csv"
    csv.write_text("abc123,1.5,7.25,0.1,0.2\nxyz789,0.0,3.0\nbad_row\n")
    rows = _read_avspeech_csv(str(csv))
    assert rows == [("abc123", 1.5, 7.25), ("xyz789", 0.0, 3.0)]


def _fake_run(stderr="", returncode=1):
    def fake(cmd, shell, capture_output, text):
        return subprocess.CompletedProcess(
            cmd, returncode=returncode, stdout="", stderr=stderr
        )
    return fake


def test_run_yt_dlp_bot_detection_aborts():
    with mock.patch("subprocess.run", _fake_run(stderr="Sign in to confirm")):
        with pytest.raises(BotDetectionError):
            run_yt_dlp("yt-dlp ...")


def test_run_yt_dlp_unavailable_returns_false():
    with mock.patch(
        "subprocess.run",
        _fake_run(stderr="Video unavailable. This video is gone", returncode=1),
    ):
        assert run_yt_dlp("yt-dlp ...") is False


def test_run_yt_dlp_success():
    with mock.patch("subprocess.run", _fake_run(returncode=0)):
        assert run_yt_dlp("yt-dlp ...", sleep_after_success=False) is True


def test_run_yt_dlp_retries_then_fails():
    calls = []

    def fake(cmd, shell, capture_output, text):
        calls.append(1)
        return subprocess.CompletedProcess(cmd, returncode=1, stdout="", stderr="err")

    with mock.patch("subprocess.run", fake), mock.patch(
        "avatar_tpu.cli.scrape.random_sleep"
    ):
        assert run_yt_dlp("yt-dlp ...", retries=3) is False
    assert len(calls) == 3
