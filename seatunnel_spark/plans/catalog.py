"""Catalog API + SaveMode handling + schema evolution.

Reference surface being re-expressed:
  * Catalog (seatunnel-api/.../table/catalog/Catalog.java:113-290):
    databaseExists/listDatabases/listTables/tableExists/getTable/
    createTable/dropTable/truncateTable.
  * SaveMode (SchemaSaveMode.java:23-32 x DataSaveMode.java:26-35,
    DefaultSaveModeHandler.java): pre-write schema + data handling.
  * Schema evolution (docs/en/concept/schema-evolution.md, table/schema/
    event/AlterTable*.java): apply ADD/DROP/RENAME/MODIFY column drift.

Two catalog backends:
  * SparkCatalog — delegates to the session catalog (Hive metastore /
    in-memory); tables are managed/external Spark tables.
  * FileCatalog — path-addressed tables (a directory of parquet/orc);
    'database' = directory, 'table' = subdirectory. This is the shape
    file-based lakes use and needs no metastore.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, types as T


class SchemaSaveMode:
    RECREATE_SCHEMA = "RECREATE_SCHEMA"
    CREATE_SCHEMA_WHEN_NOT_EXIST = "CREATE_SCHEMA_WHEN_NOT_EXIST"
    ERROR_WHEN_SCHEMA_NOT_EXIST = "ERROR_WHEN_SCHEMA_NOT_EXIST"
    IGNORE = "IGNORE"


class DataSaveMode:
    DROP_DATA = "DROP_DATA"
    APPEND_DATA = "APPEND_DATA"
    CUSTOM_PROCESSING = "CUSTOM_PROCESSING"
    ERROR_WHEN_DATA_EXISTS = "ERROR_WHEN_DATA_EXISTS"


class FileCatalog:
    """Path-addressed catalog: <root>/<database>/<table>/ holds files."""

    def __init__(self, spark: SparkSession, root: str, file_format: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = file_format

    def _db_path(self, db: str) -> str:
        return os.path.join(self.root, db)

    def _tbl_path(self, db: str, table: str) -> str:
        return os.path.join(self.root, db, table)

    # -- Catalog.java API --------------------------------------------------
    def database_exists(self, db: str) -> bool:
        return os.path.isdir(self._db_path(db))

    def list_databases(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(d for d in os.listdir(self.root)
                      if os.path.isdir(self._db_path(d)))

    def create_database(self, db: str, ignore_if_exists: bool = True) -> None:
        if self.database_exists(db) and not ignore_if_exists:
            raise ValueError(f"database {db} already exists")
        os.makedirs(self._db_path(db), exist_ok=True)

    def drop_database(self, db: str, ignore_if_not_exists: bool = True) -> None:
        if not self.database_exists(db):
            if ignore_if_not_exists:
                return
            raise ValueError(f"database {db} does not exist")
        shutil.rmtree(self._db_path(db))

    def list_tables(self, db: str) -> list[str]:
        if not self.database_exists(db):
            return []
        return sorted(t for t in os.listdir(self._db_path(db))
                      if os.path.isdir(self._tbl_path(db, t)))

    def table_exists(self, db: str, table: str) -> bool:
        return os.path.isdir(self._tbl_path(db, table))

    def get_table(self, db: str, table: str) -> DataFrame:
        if not self.table_exists(db, table):
            raise ValueError(f"table {db}.{table} does not exist")
        return self.spark.read.format(self.fmt).load(self._tbl_path(db, table))

    def get_table_schema(self, db: str, table: str) -> T.StructType:
        return self.get_table(db, table).schema

    def create_table(self, db: str, table: str, df: DataFrame | None = None,
                     schema: T.StructType | None = None,
                     ignore_if_exists: bool = True) -> None:
        if self.table_exists(db, table):
            if ignore_if_exists:
                return
            raise ValueError(f"table {db}.{table} already exists")
        self.create_database(db)
        path = self._tbl_path(db, table)
        if df is not None:
            df.write.format(self.fmt).save(path)
        elif schema is not None:
            self.spark.createDataFrame([], schema).write.format(self.fmt).save(path)
        else:
            os.makedirs(path, exist_ok=True)

    def drop_table(self, db: str, table: str, ignore_if_not_exists: bool = True) -> None:
        if not self.table_exists(db, table):
            if ignore_if_not_exists:
                return
            raise ValueError(f"table {db}.{table} does not exist")
        shutil.rmtree(self._tbl_path(db, table))

    def truncate_table(self, db: str, table: str) -> None:
        schema = self.get_table_schema(db, table)
        shutil.rmtree(self._tbl_path(db, table))
        self.create_table(db, table, schema=schema)

    def table_has_data(self, db: str, table: str) -> bool:
        return self.table_exists(db, table) and not self.get_table(db, table).isEmpty()

    # -- SaveMode handler (DefaultSaveModeHandler analog) ------------------
    def handle_save_mode(self, db: str, table: str, df: DataFrame,
                         schema_save_mode: str = SchemaSaveMode.CREATE_SCHEMA_WHEN_NOT_EXIST,
                         data_save_mode: str = DataSaveMode.APPEND_DATA,
                         custom_sql=None) -> None:
        ssm, dsm = schema_save_mode.upper(), data_save_mode.upper()
        if ssm == SchemaSaveMode.RECREATE_SCHEMA:
            self.drop_table(db, table)
            self.create_table(db, table, schema=df.schema)
        elif ssm == SchemaSaveMode.CREATE_SCHEMA_WHEN_NOT_EXIST:
            if not self.table_exists(db, table):
                self.create_table(db, table, schema=df.schema)
        elif ssm == SchemaSaveMode.ERROR_WHEN_SCHEMA_NOT_EXIST:
            if not self.table_exists(db, table):
                raise ValueError(f"schema for {db}.{table} does not exist")
        elif ssm == SchemaSaveMode.IGNORE:
            pass
        else:
            raise ValueError(f"unknown schema_save_mode {schema_save_mode!r}")

        path = self._tbl_path(db, table)
        if dsm == DataSaveMode.DROP_DATA:
            self.truncate_table(db, table)
            df.write.format(self.fmt).mode("append").save(path)
        elif dsm == DataSaveMode.APPEND_DATA:
            df.write.format(self.fmt).mode("append").save(path)
        elif dsm == DataSaveMode.ERROR_WHEN_DATA_EXISTS:
            if self.table_has_data(db, table):
                raise ValueError(f"table {db}.{table} already has data")
            df.write.format(self.fmt).mode("append").save(path)
        elif dsm == DataSaveMode.CUSTOM_PROCESSING:
            if custom_sql:
                self.spark.sql(custom_sql)
            df.write.format(self.fmt).mode("append").save(path)
        else:
            raise ValueError(f"unknown data_save_mode {data_save_mode!r}")


# ---------------------------------------------------------------------------
# schema evolution
# ---------------------------------------------------------------------------

def diff_schemas(old: T.StructType, new: T.StructType) -> list[dict]:
    """Detect drift events between consecutive (micro)batch schemas.

    Emits the reference's event vocabulary (AlterTableAddColumnEvent /
    DropColumn / ChangeColumn — schema-evolution.md:9-13). Renames are
    reported as drop+add (indistinguishable without identity info).
    """
    events: list[dict] = []
    old_map = {f.name: f for f in old.fields}
    new_map = {f.name: f for f in new.fields}
    for name, f in new_map.items():
        if name not in old_map:
            events.append({"kind": "ADD_COLUMN", "name": name,
                           "type": f.dataType.simpleString()})
        elif old_map[name].dataType != f.dataType:
            events.append({"kind": "CHANGE_COLUMN", "name": name,
                           "from": old_map[name].dataType.simpleString(),
                           "to": f.dataType.simpleString()})
    for name in old_map:
        if name not in new_map:
            events.append({"kind": "DROP_COLUMN", "name": name})
    return events


def evolve_dataframe(df: DataFrame, target: T.StructType) -> DataFrame:
    """Conform a batch to the target schema: add missing columns as
    nulls, drop extras, cast changed types — the sink-side application
    of schema drift (the reference applies DDL on the sink; columnar
    files just need the write-side projection)."""
    from pyspark.sql import functions as F

    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            col = F.col(f.name)
            if have[f.name].dataType != f.dataType:
                col = col.cast(f.dataType)
            cols.append(col.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
