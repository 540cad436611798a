"""get_session must never clobber an externally-configured master.

Round-1/2 regression: ``elif "SPARK_GRAFT_LOCAL" in os.environ or True``
unconditionally forced ``local[N]``, so ``spark-submit --master yarn``
could never reach a cluster. The decision now lives in
``_master_already_configured``; these tests pin each detection path.
"""

from __future__ import annotations

from big_data_project_implementation_spark import session


def _clear_master_env(monkeypatch):
    monkeypatch.delenv("PYSPARK_SUBMIT_ARGS", raising=False)


def test_generic_master_env_var_is_ignored(monkeypatch):
    """MASTER is a generic shell variable name (e.g. a DB primary
    host); an unrelated export must not suppress the local fallback."""
    _clear_master_env(monkeypatch)
    monkeypatch.setenv("MASTER", "db-primary.internal")

    class FakeConf:
        def contains(self, key):
            return False

    monkeypatch.setattr("pyspark.SparkConf", FakeConf)
    assert not session._master_already_configured()


def test_submit_args_master_wins(monkeypatch):
    _clear_master_env(monkeypatch)
    monkeypatch.setenv(
        "PYSPARK_SUBMIT_ARGS",
        "--master k8s://https://host:443 --deploy-mode cluster pyspark-shell",
    )
    assert session._master_already_configured()


def test_spark_defaults_master_wins(monkeypatch):
    _clear_master_env(monkeypatch)

    class FakeConf:
        def contains(self, key):
            return key == "spark.master"

    monkeypatch.setattr("pyspark.SparkConf", FakeConf)
    assert session._master_already_configured()


def test_unconfigured_falls_back_to_local(monkeypatch):
    _clear_master_env(monkeypatch)

    class FakeConf:
        def contains(self, key):
            return False

    monkeypatch.setattr("pyspark.SparkConf", FakeConf)
    assert not session._master_already_configured()
