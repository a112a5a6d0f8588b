"""seatunnel_spark — a PySpark-native data-integration & analytics engine.

A ground-up rebuild of the capabilities of Apache SeaTunnel
(reference: /root/reference, see SURVEY.md) with an idiomatic Spark
architecture: DataFrames are the IR, Catalyst is the optimizer, and
sources/transforms/sinks are thin declarative plugins.

Reference architecture being re-expressed (not ported):
  * job model  : env + source + transform + sink blocks
                 (reference: docs/en/concept/config.md:28-70)
  * transforms : 17 row-level transforms
                 (reference: seatunnel-transforms-v2/)
  * SQL surface: single-table Zeta dialect -> strict superset via spark.sql
                 (reference: seatunnel-transforms-v2/.../zeta/ZetaSQLEngine.java)
"""

from seatunnel_spark.session import get_spark, stop_spark
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.job.engine import JobEngine, run_job
import seatunnel_spark.registry  # noqa: F401  (extends source/sink registries)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "JobSpec",
    "JobEngine",
    "run_job",
]
