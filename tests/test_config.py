"""Configuration store — InitializeBatchFramework parity."""

from __future__ import annotations

import pytest

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.sources import (
    config,
)


def test_build_save_load_round_trip(spark, tmp_path):
    cfg = config.build_configuration(
        spark,
        platform_host="example.invalid",
        platform_username="user",
        platform_password="secret",
        igniter_thread_pool_size=7,
    )
    path = str(tmp_path / "config")
    config.save_configuration(cfg, path)
    loaded = config.load_configuration(spark, path)
    assert loaded["igniter_thread_pool_size"] == 7
    assert loaded["finalizer_thread_pool_size"] == config.DEFAULTS["finalizer_thread_pool_size"]
    assert loaded["platform_host"] == "example.invalid"


def test_missing_required_field_raises_1001_style(spark):
    with pytest.raises(config.ConfigurationError, match="Missing request field 'platformHost'"):
        config.build_configuration(spark, platform_username="u", platform_password="p")


def test_unknown_field_rejected(spark):
    with pytest.raises(config.ConfigurationError, match="Unknown configuration"):
        config.build_configuration(
            spark,
            platform_host="h", platform_username="u", platform_password="p",
            bogus_field=1,
        )
