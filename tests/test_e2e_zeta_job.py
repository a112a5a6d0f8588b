"""End-to-end e2e in the reference's own test shape: a HOCON job with
FakeSource -> Sql (Zeta dialect) -> Assert sink (the backbone pattern of
seatunnel-e2e, e.g. seatunnel-transforms-v2-e2e-part-2/src/test/
resources/sql_transform.conf and sql_transform/func_datetime.conf) —
run through JobSpec.from_hocon + JobEngine on Spark."""

import pytest

from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.sinks.assert_sink import AssertError


CONF = """
env {
  parallelism = 2
  job.mode = "BATCH"
}

source {
  FakeSource {
    plugin_output = "fake1"
    row.num = 100
    schema = {
      fields {
        id = bigint
        name = string
        score = double
        created = timestamp
      }
    }
  }
}

transform {
  Sql {
    plugin_input = "fake1"
    plugin_output = "out"
    query = \"\"\"select id, ucase(name) as uname, concat(name, '!') as bang,
      round(score, 1) as score1,
      dateadd(created, 1, 'DAY') as next_day,
      datediff(created, dateadd(created, 3, 'DAY')) as dd,
      date_trunc(created, 'DAY') as day0,
      extract(DAYOFWEEK from created) as dow,
      case when score > 50 then 'hi' else 'lo' end as band
      from fake1 where id >= 0\"\"\"
  }
}

sink {
  Assert {
    plugin_input = "out"
    rules {
      row_rules = [
        { rule_type = MIN_ROW, rule_value = 100 },
        { rule_type = MAX_ROW, rule_value = 100 }
      ]
      field_rules = [
        { field_name = "uname", field_value = [{ rule_type = NOT_NULL }] },
        { field_name = "dd", field_value = [
            { rule_type = MIN, rule_value = 3 },
            { rule_type = MAX, rule_value = 3 }
        ]},
        { field_name = "dow", field_value = [
            { rule_type = MIN, rule_value = 1 },
            { rule_type = MAX, rule_value = 7 }
        ]},
        { field_name = "band", field_value = [
            { rule_type = MIN_LENGTH, rule_value = 2 },
            { rule_type = MAX_LENGTH, rule_value = 2 }
        ]}
      ]
    }
  }
}
"""


def test_zeta_job_end_to_end(spark, tmp_path):
    conf = tmp_path / "zeta_job.conf"
    conf.write_text(CONF)
    spec = JobSpec.from_hocon(str(conf))
    tables = JobEngine(spark).run(spec)  # Assert sink raises on violation
    out = tables["out"]
    assert out.count() == 100
    row = out.first()
    assert row["uname"] == row["uname"].upper()
    assert row["bang"].endswith("!")
    # datediff(created, created+3d) = +3 (b - a, Zeta direction)
    assert row["dd"] == 3


def test_zeta_job_assert_catches_violation(spark, tmp_path):
    bad = CONF.replace("rule_type = MIN_ROW, rule_value = 100",
                       "rule_type = MIN_ROW, rule_value = 101")
    conf = tmp_path / "bad_job.conf"
    conf.write_text(bad)
    spec = JobSpec.from_hocon(str(conf))
    with pytest.raises(AssertError):
        JobEngine(spark).run(spec)
