"""Logger tier (the reference's tests/test_utils/test_mpi_logger.py role:
echo filtering and logfile output, mpi_logger.py:9-45)."""

import logging
import os

from sopht_mpi_tpu.utils import logger
from sopht_mpi_tpu.utils.logging_utils import FlowLogger


def _file_handlers():
    return [
        h
        for h in logging.getLogger("sopht_mpi_tpu").handlers
        if isinstance(h, logging.FileHandler)
    ]


def test_singleton_and_level_filtering(caplog):
    # FlowLogger instances share the one underlying logger (the reference's
    # module singleton, mpi_logger.py:158)
    assert FlowLogger()._logger is logger._logger
    with caplog.at_level(logging.WARNING, logger="sopht_mpi_tpu"):
        logger.info("info-not-captured")
        logger.warning("warn-captured")
    assert "warn-captured" in caplog.text
    assert "info-not-captured" not in caplog.text


def test_logfile_output(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    before = set(_file_handlers())
    logger.enable_write_to_logfile("run", timestamp=False)
    try:
        logger.info("hello-logfile")
        for h in _file_handlers():
            h.flush()
        text = open(tmp_path / "run.log").read()
        assert "hello-logfile" in text
        assert "INFO" in text
    finally:
        # detach so later tests don't write into the removed tmp dir
        for h in set(_file_handlers()) - before:
            logging.getLogger("sopht_mpi_tpu").removeHandler(h)
            h.close()


def test_timestamped_logfile_name(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    before = set(_file_handlers())
    logger.enable_write_to_logfile("stamped", timestamp=True)
    try:
        names = [os.path.basename(h.baseFilename)
                 for h in set(_file_handlers()) - before]
        assert len(names) == 1
        assert names[0].startswith("stamped_") and names[0].endswith(".log")
    finally:
        for h in set(_file_handlers()) - before:
            logging.getLogger("sopht_mpi_tpu").removeHandler(h)
            h.close()
