import pytest
from pyspark.sql import types as T

from seatunnel_spark.plans import (
    DataSaveMode,
    FileCatalog,
    SchemaSaveMode,
    diff_schemas,
    evolve_dataframe,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return FileCatalog(spark, str(tmp_path / "warehouse"))


def test_catalog_lifecycle(spark, cat):
    assert cat.list_databases() == []
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    cat.create_table("db1", "t1", df=df)
    assert cat.database_exists("db1")
    assert cat.list_tables("db1") == ["t1"]
    assert cat.get_table("db1", "t1").count() == 1
    cat.truncate_table("db1", "t1")
    assert cat.get_table("db1", "t1").count() == 0
    assert cat.get_table_schema("db1", "t1").fieldNames() == ["id", "name"]
    cat.drop_table("db1", "t1")
    assert not cat.table_exists("db1", "t1")
    with pytest.raises(ValueError):
        cat.get_table("db1", "t1")


def test_save_modes(spark, cat):
    df = spark.createDataFrame([(1,)], ["id"])
    # create when missing + append
    cat.handle_save_mode("db", "t", df)
    cat.handle_save_mode("db", "t", df)
    assert cat.get_table("db", "t").count() == 2
    # drop data
    cat.handle_save_mode("db", "t", df, data_save_mode=DataSaveMode.DROP_DATA)
    assert cat.get_table("db", "t").count() == 1
    # error when data exists
    with pytest.raises(ValueError, match="already has data"):
        cat.handle_save_mode("db", "t", df,
                             data_save_mode=DataSaveMode.ERROR_WHEN_DATA_EXISTS)
    # error when schema missing
    with pytest.raises(ValueError, match="does not exist"):
        cat.handle_save_mode("db", "t2", df,
                             schema_save_mode=SchemaSaveMode.ERROR_WHEN_SCHEMA_NOT_EXIST)
    # recreate schema drops old rows
    cat.handle_save_mode("db", "t", df,
                         schema_save_mode=SchemaSaveMode.RECREATE_SCHEMA)
    assert cat.get_table("db", "t").count() == 1


def test_schema_evolution(spark):
    old = T.StructType([T.StructField("a", T.IntegerType()),
                        T.StructField("b", T.StringType())])
    new = T.StructType([T.StructField("a", T.LongType()),
                        T.StructField("c", T.DoubleType())])
    events = {(e["kind"], e["name"]) for e in diff_schemas(old, new)}
    assert events == {("CHANGE_COLUMN", "a"), ("ADD_COLUMN", "c"),
                      ("DROP_COLUMN", "b")}

    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    out = evolve_dataframe(df, new)
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["bigint", "double"]
    row = out.first()
    assert row["a"] == 1 and row["c"] is None
