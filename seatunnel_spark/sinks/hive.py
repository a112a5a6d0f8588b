"""Hive sink — managed-table writes through the session catalog.

Reference: connector-hive sink (docs/en/connector-v2/sink/Hive.md —
table_name, partition_by, overwrite semantics via savemode). Spark
owns the Hive write path natively (`saveAsTable`/`insertInto` with
dynamic partition overwrite), so the sink is pure mode mapping:
SchemaSaveMode × DataSaveMode (DefaultSaveModeHandler.java) onto
DataFrameWriter modes. Works against any configured metastore; tests
use the local warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from seatunnel_spark.sinks.base import Sink


class HiveSink(Sink):
    NAME = "Hive"

    def write(self, df: DataFrame) -> None:
        if self.opt("kerberos_principal"):
            # HiveMetaStoreProxy.loginUserFromKeytab analog: a REAL AS
            # exchange against the conf's KDC before touching the
            # catalog — bad keytab / unknown principal fails the job
            # exactly like the JVM login would
            from seatunnel_spark import krb5 as _krb

            _krb.kinit(str(self.require("kerberos_principal")),
                       str(self.require("kerberos_keytab_path")),
                       str(self.opt("krb5_path", "/etc/krb5.conf")))
        table = self.opt("table_name") or self.require("table")
        spark = df.sparkSession
        if "." in str(table):
            # the IT pre-creates the database in its metastore; the
            # session-catalog analog creates the namespace
            db = str(table).rsplit(".", 1)[0]
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        exists = spark.catalog.tableExists(table)

        schema_mode = str(self.opt("schema_save_mode",
                                   "CREATE_SCHEMA_WHEN_NOT_EXIST")).upper()
        data_mode = str(self.opt("data_save_mode", "APPEND_DATA")).upper()

        if schema_mode == "ERROR_WHEN_SCHEMA_NOT_EXIST" and not exists:
            raise ValueError(f"Hive sink: table {table} does not exist "
                             "(ERROR_WHEN_SCHEMA_NOT_EXIST)")
        if schema_mode == "RECREATE_SCHEMA" and exists:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            exists = False

        writer = df.write
        if self.opt("partition_by"):
            writer = writer.partitionBy(*self.opt("partition_by"))

        if not exists:
            writer.saveAsTable(table)
            return
        if data_mode == "DROP_DATA":
            # Overwrite data, keep schema — dynamic-partition-friendly.
            writer.mode("overwrite").insertInto(table, overwrite=True)
        elif data_mode == "ERROR_WHEN_DATA_EXISTS" and spark.table(table).take(1):
            raise ValueError(f"Hive sink: table {table} already has data "
                             "(ERROR_WHEN_DATA_EXISTS)")
        else:
            writer.insertInto(table)
