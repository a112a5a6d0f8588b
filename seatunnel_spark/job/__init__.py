from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.job.engine import JobEngine, run_job

__all__ = ["JobSpec", "JobEngine", "run_job"]
