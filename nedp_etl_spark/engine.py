"""In-process engine session — control-surface parity with the reference's
``DBTOperator`` (``/root/reference/dbtoperator.py:40-461``), minus the
venv/S3/subprocess/Thrift indirection that an in-process PySpark engine
makes unnecessary (SURVEY §2.1 R1-R11 mapping).

Parity map (reference → here):
- ``__init__`` config (R1)                → :class:`EngineSession` kwargs
- ``initialize`` 5-step bootstrap (R2)    → :meth:`initialize` (session conf
  + fixture views; no venv/pip/S3)
- ``run_dbt_command`` (R7)                → :meth:`run` — executes one named
  registry query or raw SQL, returns the same ``{'success', 'command',
  ...}`` result dict shape (``dbtoperator.py:379-385``)
- ``execute`` fail-fast command loop (R8) → :meth:`execute`
  (stops on first failure like ``dbtoperator.py:432-434``, cleanup always
  attempted like ``dbtoperator.py:437-451``)
- ``cleanup`` (R9)                        → :meth:`cleanup` (drop temp views)
- context manager (R10)                   → ``__enter__``/``__exit__``
- ``LogLevel`` threshold logging (R11)    → stdlib ``logging`` levels
- guard: run before init raises (``dbtoperator.py:336-337``) → same
"""

from __future__ import annotations

import logging
import time
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from nedp_etl_spark import oracle_sql, queries
from nedp_etl_spark.data import TABLES, prepare, views

logger = logging.getLogger("nedp_etl_spark")


class EngineSession:
    """A configured engine session over one SparkSession + fixture dir."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        log_level: int = logging.INFO,
        register_views: bool = True,
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        self.register_views = register_views
        self._initialized = False
        logger.setLevel(log_level)

    # -- lifecycle ---------------------------------------------------------

    def initialize(self) -> dict[str, Any]:
        """Bootstrap: apply session conf, register fixture temp views."""
        t0 = time.perf_counter()
        prepare(self.spark)
        if self.register_views:
            views(self.spark, self.sf_dir)
        self._initialized = True
        dt = time.perf_counter() - t0
        logger.info("engine initialized in %.3fs (sf_dir=%s)", dt, self.sf_dir)
        return {"status": "success", "seconds": dt, "sf_dir": self.sf_dir}

    def cleanup(self) -> None:
        for t in TABLES:
            try:
                self.spark.catalog.dropTempView(t)
            except Exception:
                pass
        self._initialized = False
        logger.debug("engine cleaned up")

    def __enter__(self) -> "EngineSession":
        self.initialize()
        return self

    def __exit__(self, *exc: object) -> None:
        self.cleanup()

    # -- execution ---------------------------------------------------------

    def run(self, command: str) -> dict[str, Any]:
        """Run one command: a registry query name, or raw SQL text.

        Mirrors ``run_dbt_command``'s result-dict contract
        (``dbtoperator.py:379-385``); like the reference, running before
        ``initialize`` raises (``dbtoperator.py:336-337``).
        """
        if not self._initialized:
            raise RuntimeError("Engine not initialized. Call initialize() first.")
        t0 = time.perf_counter()
        try:
            df = self._dispatch(command)
            n = df.count()
            dt = time.perf_counter() - t0
            logger.info("command %r: %d rows in %.3fs", command, n, dt)
            return {
                "success": True,
                "return_code": 0,
                "command": command,
                "rows": n,
                "seconds": dt,
            }
        except Exception as exc:  # faithfully: capture, don't raise (R7)
            logger.error("command %r failed: %s", command, exc)
            return {
                "success": False,
                "return_code": 1,
                "command": command,
                "error": str(exc),
                "seconds": time.perf_counter() - t0,
            }

    def _dispatch(self, command: str) -> DataFrame:
        q = queries()
        if command in q:
            return q[command](self.spark, self.sf_dir)
        return self.spark.sql(command)

    def execute(self, commands: Optional[list[str]] = None) -> dict[str, Any]:
        """Run a command list fail-fast (first failure stops the run —
        ``dbtoperator.py:432-434``); cleanup always runs (``:437-451``)."""
        commands = commands if commands is not None else ["dbt_schema_tests"]
        results: list[dict[str, Any]] = []
        try:
            for cmd in commands:
                res = self.run(cmd)
                results.append(res)
                if not res["success"]:
                    return {"status": "failed", "failed_command": cmd, "results": results}
            return {"status": "success", "results": results}
        finally:
            self.cleanup()

    # -- introspection -----------------------------------------------------

    @staticmethod
    def available_commands() -> list[str]:
        return sorted(queries().keys())

    @staticmethod
    def oracle_for(name: str) -> Optional[str]:
        return oracle_sql().get(name)
