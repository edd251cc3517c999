"""Env-driven storage configuration tests.

Parity with the reference configuration-management suite (reference:
tests/test_configuration_management.rs and
src/storage/s5_storage_factory.rs:22-176): STORAGE_MODE/S5_MODE selection,
timeout/retry parsing, encrypt-at-rest flag, 12/24-word seed phrase
validation from env or file (permission warning), secret-free summaries,
and the REST factory's mock fallback.
"""
import os

import pytest

from fabstir_vectordb_tpu.core import (
    CachedObjectStore,
    MemoryObjectStore,
    StorageError,
)
from fabstir_vectordb_tpu.storage.factory import (
    StorageConfig,
    StorageFactory,
    validate_seed_phrase,
)

SEED12 = "alpha " * 11 + "omega"
SEED24 = "word " * 23 + "end"


@pytest.fixture
def clean_env(monkeypatch):
    for var in ("STORAGE_MODE", "S5_MODE", "S5_MOCK_SERVER_URL",
                "S5_PORTAL_URL", "FS_STORAGE_ROOT", "S5_SEED_PHRASE",
                "S5_SEED_PHRASE_FILE", "S5_CONNECTION_TIMEOUT",
                "S5_RETRY_ATTEMPTS", "S5_ENCRYPT_AT_REST"):
        monkeypatch.delenv(var, raising=False)
    return monkeypatch


class TestConfigFromEnv:
    def test_defaults(self, clean_env):
        cfg = StorageFactory.config_from_env()
        assert cfg.mode == "mock"
        assert cfg.timeout == 30.0
        assert cfg.retries == 3
        assert cfg.encrypt_at_rest is True
        assert cfg.seed_phrase is None

    def test_env_overrides(self, clean_env):
        clean_env.setenv("STORAGE_MODE", "REAL")  # case-insensitive
        clean_env.setenv("S5_PORTAL_URL", "http://portal:5522")
        clean_env.setenv("S5_CONNECTION_TIMEOUT", "5000")  # ms, like reference
        clean_env.setenv("S5_RETRY_ATTEMPTS", "7")
        clean_env.setenv("S5_ENCRYPT_AT_REST", "false")
        clean_env.setenv("S5_SEED_PHRASE", SEED12)
        cfg = StorageFactory.config_from_env()
        assert cfg.mode == "real"
        assert cfg.portal_url == "http://portal:5522"
        assert cfg.timeout == 5.0
        assert cfg.retries == 7
        assert cfg.encrypt_at_rest is False
        assert cfg.seed_phrase == SEED12

    def test_s5_mode_fallback_var(self, clean_env):
        clean_env.setenv("S5_MODE", "fs")
        assert StorageFactory.config_from_env().mode == "fs"

    def test_summary_hides_secrets(self, clean_env):
        cfg = StorageConfig(mode="real", seed_phrase=SEED12)
        s = cfg.summary()
        assert s["seed_phrase"] == "***"
        assert SEED12 not in str(s)


class TestSeedPhrase:
    def test_valid_lengths(self):
        validate_seed_phrase(SEED12)
        validate_seed_phrase(SEED24)

    def test_invalid_length(self):
        with pytest.raises(StorageError, match="12 or 24"):
            validate_seed_phrase("only three words")

    def test_seed_file_wins_and_strips(self, clean_env, tmp_path):
        f = tmp_path / "seed"
        f.write_text(SEED12 + "\n")
        os.chmod(f, 0o600)
        clean_env.setenv("S5_SEED_PHRASE_FILE", str(f))
        clean_env.setenv("S5_SEED_PHRASE", "ignored wrong phrase")
        assert StorageFactory.config_from_env().seed_phrase == SEED12

    def test_seed_file_bad_phrase_raises(self, clean_env, tmp_path):
        f = tmp_path / "seed"
        f.write_text("too short")
        os.chmod(f, 0o600)
        clean_env.setenv("S5_SEED_PHRASE_FILE", str(f))
        with pytest.raises(StorageError):
            StorageFactory.config_from_env()

    def test_world_readable_file_warns(self, clean_env, tmp_path, caplog):
        import logging

        f = tmp_path / "seed"
        f.write_text(SEED12)
        os.chmod(f, 0o644)
        clean_env.setenv("S5_SEED_PHRASE_FILE", str(f))
        with caplog.at_level(logging.WARNING,
                             logger="fabstir_vectordb_tpu.storage.factory"):
            StorageFactory.config_from_env()
        assert any("readable" in r.message for r in caplog.records)


class TestCreate:
    def test_mock(self, clean_env):
        assert isinstance(StorageFactory.create(), MemoryObjectStore)

    def test_fs_wraps_cache_retry(self, clean_env, tmp_path):
        clean_env.setenv("STORAGE_MODE", "fs")
        clean_env.setenv("FS_STORAGE_ROOT", str(tmp_path))
        store = StorageFactory.create()
        assert isinstance(store, CachedObjectStore)
        store.put("k", b"v")
        assert store.get("k") == b"v"

    def test_fs_encrypts_with_seed(self, clean_env, tmp_path):
        clean_env.setenv("STORAGE_MODE", "fs")
        clean_env.setenv("FS_STORAGE_ROOT", str(tmp_path))
        clean_env.setenv("S5_SEED_PHRASE", SEED12)
        store = StorageFactory.create()
        store.put("secret.bin", b"plaintext-payload")
        on_disk = (tmp_path / "secret.bin").read_bytes()
        assert b"plaintext-payload" not in on_disk  # encrypted at rest

    def test_unknown_mode_raises(self, clean_env):
        clean_env.setenv("STORAGE_MODE", "carrier-pigeon")
        with pytest.raises(StorageError, match="unknown storage mode"):
            StorageFactory.create()

    def test_create_from_env_falls_back_to_mock(self, clean_env):
        clean_env.setenv("STORAGE_MODE", "carrier-pigeon")
        store = StorageFactory.create_from_env()
        assert isinstance(store, MemoryObjectStore)
