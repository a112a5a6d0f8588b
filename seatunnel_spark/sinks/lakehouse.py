"""Lakehouse sinks (Iceberg / Paimon / Hudi) — changelog MERGE apply
into a versioned table.

Reference semantics (the "cdc sink" feature, connector-v2-features.md:
57-75): apply +I/-U/+U/-D by primary key into a table that supports
row-level updates — connector-iceberg/.../sink/IcebergSink.java
(iceberg.table.primary-keys, upsert-mode-enabled, schema_save_mode ×
data_save_mode), connector-paimon (primary-key table), connector-hudi
(record_key_fields upsert).

Backend: none of the lakehouse runtimes ship in this sandbox, so the
table format is a self-contained VERSIONED PARQUET layout with the
same commit semantics the real formats give you:

    <warehouse>/<db>/<table>/
        v0/ v1/ ... vN/     immutable snapshot directories
        _HEAD               pointer file, atomically os.replace'd

A MERGE commit computes the new snapshot DISTRIBUTED (one PK-keyed
shuffle join per batch: last-event-per-key tombstones applied over the
current snapshot — exactly MERGE INTO ... WHEN MATCHED UPDATE/DELETE
WHEN NOT MATCHED INSERT) and the pointer flip makes readers see old or
new atomically. On a real deployment swap the commit for
`iceberg-spark-runtime` MERGE INTO / paimon-spark / hudi-spark-bundle;
the changelog-apply DataFrame logic is the part that carries over.

Scale note: this rewrites the full snapshot per commit (fine for the
sandbox; real Iceberg does file-level pruning). The apply join itself
is the 100 TB-correct shape — one shuffle keyed on the PK, no driver
materialization, partitioned output preserved via partition_keys.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


class _S3Mirror:
    """Mirror a lakehouse table directory to an S3 prefix through the
    stdlib SigV4 REST client — the fs.s3a.* warehouse confs
    (paimon.hadoop.conf) without hadoop-aws jars. Sync model: pull the
    table tree before open, push the new snapshot after commit, wipe on
    drop. On a real 100 TB deployment the table scan itself goes
    through spark.read over s3a:// with hadoop-aws on the classpath
    (distributed, no staging); this mirror carries the bounded
    e2e-fixture scale, same story as the S3File connector (s3_fs)."""

    def __init__(self, client, prefix: str):
        self.cl, self.prefix = client, prefix.strip("/")

    def pull(self, local: str) -> None:
        import shutil

        shutil.rmtree(local, ignore_errors=True)
        os.makedirs(local, exist_ok=True)
        for key in self.cl.list(self.prefix + "/"):
            rel = key[len(self.prefix):].lstrip("/")
            if not rel:
                continue
            dst = os.path.join(local, rel)
            os.makedirs(os.path.dirname(dst) or local, exist_ok=True)
            with open(dst, "wb") as f:
                f.write(self.cl.get(key))

    def push(self, local: str) -> None:
        for root, _d, names in os.walk(local):
            for n in names:
                if n.startswith("_head_"):
                    continue  # mkstemp leftovers never upload
                full = os.path.join(root, n)
                rel = os.path.relpath(full, local).replace(os.sep, "/")
                with open(full, "rb") as f:
                    self.cl.put(f"{self.prefix}/{rel}", f.read())

    def wipe(self) -> None:
        for key in self.cl.list(self.prefix + "/"):
            self.cl.delete(key)


class LakehouseTable:
    """Versioned parquet table with an atomic HEAD pointer.

    `remote`: optional _S3Mirror — `path` then acts as the local cache
    of an object-store warehouse (pulled at open, pushed per commit)."""

    def __init__(self, path: str, remote=None):
        self.path = path
        self.remote = remote
        if remote is not None:
            remote.pull(path)
        os.makedirs(path, exist_ok=True)

    def _head_file(self) -> str:
        return os.path.join(self.path, "_HEAD")

    def head(self) -> int | None:
        try:
            with open(self._head_file()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def exists(self) -> bool:
        return self.head() is not None

    def read(self, spark: SparkSession) -> DataFrame | None:
        h = self.head()
        if h is None:
            return None
        df = spark.read.parquet(os.path.join(self.path, f"v{h}"))
        part_cols = [c for c in df.columns if c.startswith("__p_")]
        return df.drop(*part_cols) if part_cols else df

    def drop(self) -> None:
        import shutil

        if self.remote is not None:
            self.remote.wipe()
        shutil.rmtree(self.path, ignore_errors=True)
        os.makedirs(self.path, exist_ok=True)

    def read_version(self, spark: SparkSession, version: int
                     ) -> DataFrame | None:
        vdir = os.path.join(self.path, f"v{version}")
        if not os.path.isdir(vdir):
            return None
        df = spark.read.parquet(vdir)
        part_cols = [c for c in df.columns if c.startswith("__p_")]
        return df.drop(*part_cols) if part_cols else df

    def read_changelog_since(self, spark: SparkSession,
                             from_version: int | None,
                             keys: list[str]) -> DataFrame:
        """Streaming/incremental read: the CHANGELOG between snapshot
        `from_version` and HEAD — the reference's paimon streaming read
        (snapshot + continuous changelog; here each poll is one bounded
        microbatch of per-key diffs).

        from_version None (or missing dir) -> the full HEAD as +I (the
        initial scan). Else a pk-keyed full-outer diff: new-only keys
        +I, changed keys -U/+U pairs, vanished keys -D — exactly the
        changelog a downstream keyed sink needs to converge to HEAD.
        One shuffle on the pk; payload comparison via struct equality
        (null-safe <=>), no driver state."""
        head = self.read(spark)
        if head is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path!r}")
        old = None if from_version is None else \
            self.read_version(spark, from_version)
        if old is None:
            return head.withColumn(ROW_KIND_COL, F.lit("+I"))
        if not keys:
            raise ValueError("incremental lakehouse read needs primary keys")
        data_cols = [c for c in head.columns]
        non_keys = [c for c in data_cols if c not in keys]
        o = old.select(*keys, F.struct(*non_keys).alias("__o")) \
            if non_keys else old.select(*keys).withColumn("__o", F.lit(0))
        n = head.select(*keys, F.struct(*non_keys).alias("__n")) \
            if non_keys else head.select(*keys).withColumn("__n", F.lit(0))
        j = o.join(n, keys, "full_outer")
        events = F.array(
            F.struct(F.col("__o").alias("p"), F.when(
                F.col("__n").isNull() & F.col("__o").isNotNull(),
                F.lit("-D")).when(
                F.col("__n").isNotNull() & F.col("__o").isNotNull()
                & ~F.col("__o").eqNullSafe(F.col("__n")),
                F.lit("-U")).alias("k")),
            F.struct(F.col("__n").alias("p"), F.when(
                F.col("__o").isNull() & F.col("__n").isNotNull(),
                F.lit("+I")).when(
                F.col("__n").isNotNull() & F.col("__o").isNotNull()
                & ~F.col("__o").eqNullSafe(F.col("__n")),
                F.lit("+U")).alias("k")),
        )
        e = j.select(*keys, F.explode(events).alias("e")) \
            .filter(F.col("e.k").isNotNull())
        return e.select(
            *keys,
            *[F.col("e.p")[c].alias(c) for c in non_keys],
            F.col("e.k").alias(ROW_KIND_COL))

    def commit(self, df: DataFrame, partition_keys: list[str] | None = None
               ) -> int:
        """Write the next snapshot dir, then atomically flip _HEAD.

        Partitioning writes DERIVED string columns (__p_<key>) so the
        directory layout prunes while the real column keeps its exact
        type (parquet partition-column type inference would otherwise
        degrade timestamps/decimals on read-back)."""
        h = self.head()
        nxt = 0 if h is None else h + 1
        out = os.path.join(self.path, f"v{nxt}")
        if partition_keys:
            for k in partition_keys:
                df = df.withColumn(f"__p_{k}", F.col(k).cast("string"))
            w = df.write.mode("overwrite").partitionBy(
                *[f"__p_{k}" for k in partition_keys])
        else:
            w = df.write.mode("overwrite")
        w.parquet(out)
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix="_head_")
        with os.fdopen(fd, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, self._head_file())  # atomic on POSIX
        if self.remote is not None:
            self.remote.push(self.path)
        return nxt

    # -- changelog producer ----------------------------------------------
    def record_changelog(self, df: DataFrame, version: int) -> None:
        """The `changelog-producer` analog (paimon write-props
        changelog-producer = lookup | full-compaction): persist the
        batch's changelog events (+I/-U/+U/-D with row data) NEXT TO
        the snapshot they produced — paimon materializes changelog
        files at write time exactly so streaming readers can serve the
        event history instead of re-diffing snapshots
        (PaimonSinkCDCIT testChangelogLookup/testChangelogFullCompaction).
        Per-bucket materialization, like paimon's: each partition writes
        its own changelog file in parallel (no single-partition funnel),
        ordered by (spark_partition_id, local sequence) —
        monotonically_increasing_id encodes exactly that pair
        (partition_id << 33 | local_seq), so arrival order within each
        bucket is genuinely sequential and cross-bucket order follows
        partition id, matching paimon's bucket-then-sequence changelog
        semantics."""
        out = os.path.join(self.path, "changelog", f"c{version}")
        (df.withColumn("__clog_seq", F.monotonically_increasing_id())
           .write.mode("overwrite").parquet(out))
        if self.remote is not None:
            self.remote.push(self.path)

    def read_changelog_log(self, spark: SparkSession) -> DataFrame | None:
        """The recorded changelog across all commits, in write order
        (ROW_KIND_COL carries each event's kind) — what a streaming
        read of a changelog-producer table serves. None when the table
        never recorded one (then streaming falls back to snapshot /
        diff semantics)."""
        import glob as _glob

        dirs = sorted(
            _glob.glob(os.path.join(self.path, "changelog", "c*")),
            key=lambda p: int(os.path.basename(p)[1:]))
        if not dirs:
            return None
        frames = [
            spark.read.parquet(d).withColumn(
                "__clog_ver",
                F.lit(int(os.path.basename(d)[1:])))
            for d in dirs]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        # distributed range sort (no single-partition funnel): global
        # order = (commit version, bucket-encoded sequence)
        return (out.orderBy("__clog_ver", "__clog_seq")
                .drop("__clog_ver", "__clog_seq"))

    # -- schema evolution -------------------------------------------------
    def evolve(self, spark: SparkSession, ops: list,
               partition_keys: list[str] | None = None) -> None:
        """Apply source schema-change ops to the committed table BEFORE
        merging an evolved batch — DROP / RENAME / MODIFY beyond the
        add-with-null-backfill the union merge gives for free (the
        reference's schema-evolution sink contract,
        docs/en/concept/schema-evolution.md:9-13; paimon
        mysql_cdc_to_paimon_with_schema_change). RENAME must rewrite
        the existing rows' column name — a frame-diff union would leave
        old values stranded under the old name with nulls under the
        new. Idempotent: ops that no longer apply are skipped."""
        cur = self.read(spark)
        if cur is None:
            return
        changed = False
        for op in ops:
            kind = op[0]
            if kind == "drop" and op[1] in cur.columns:
                cur = cur.drop(op[1])
                changed = True
            elif kind == "rename" and op[1] in cur.columns:
                cur = cur.withColumnRenamed(op[1], op[2])
                changed = True
            elif kind == "modify" and op[1] in cur.columns:
                from seatunnel_spark.types import parse_schema

                dt = parse_schema({op[1]: op[2]}).fields[0].dataType
                if dict(cur.dtypes)[op[1]] != dt.simpleString():
                    cur = cur.withColumn(op[1],
                                         F.col(op[1]).cast(dt))
                    changed = True
        if changed:
            self.commit(cur, partition_keys)

    # -- MERGE INTO analog ------------------------------------------------
    def merge_apply(self, spark: SparkSession, batch: DataFrame,
                    keys: list[str], order_col: str | None = None,
                    partition_keys: list[str] | None = None) -> int:
        """Apply a +I/-U/+U/-D changelog batch by primary key.

        Last event per key wins within the batch (`order_col`, falling
        back to arrival order); a final -U or -D removes the key. -U
        rows are NOT simply droppable: when an update CHANGES the
        primary key, the -U carries the old key whose row must go away
        while the +U inserts the new key (the reference's paimon sink
        maps UPDATE_BEFORE to a delete op — PaimonSinkCDCIT key-change
        cases). For the common pk-stable update the -U is immediately
        superseded by its +U on the same key, so behavior is unchanged.
        Equivalent SQL: MERGE INTO t USING compacted ON t.pk = c.pk
        WHEN MATCHED AND c.kind IN ('-D','-U') THEN DELETE WHEN MATCHED
        THEN UPDATE SET * WHEN NOT MATCHED AND c.kind NOT IN
        ('-D','-U') THEN INSERT *.

        Determinism: the winner per key depends ONLY on row content,
        never on partition layout. With `order_col` (any CDC feed
        offset/ts) the sequence is the feed's own order; without one
        there is NO arrival order in a distributed frame — all events
        of a key tie on seq and the tie chain below (kind rank, then a
        content hash, then the remapped kind) picks a reproducible
        winner. Same input rows => same final table, whether the batch
        arrives as 1 partition or 200 (test: shuffled-input invariance).
        """
        data_cols = [c for c in batch.columns
                     if c not in (ROW_KIND_COL, TABLE_ID_COL, order_col)]
        seq = F.col(order_col) if order_col else F.lit(0)
        # a -U and its +U decode from ONE source event and share the
        # order value — the tie must resolve to the +U (update-after
        # supersedes update-before on the same key); only a pk-CHANGING
        # update leaves the -U as its old key's last word, where the
        # -D remap deletes the moved-away row.
        rank = F.when(F.col(ROW_KIND_COL) == "-U", 0).otherwise(1)

        def _has_map(t):
            from pyspark.sql import types as T

            if isinstance(t, T.MapType):
                return True
            if isinstance(t, T.StructType):
                return any(_has_map(f.dataType) for f in t.fields)
            if isinstance(t, T.ArrayType):
                return _has_map(t.elementType)
            return False

        dtypes = {f.name: f.dataType for f in batch.schema.fields}
        # xxhash64 rejects MAP-typed inputs (hashcodes unstable) —
        # serialize those columns to their canonical JSON first
        tie = F.xxhash64(F.struct(*[
            F.to_json(F.struct(F.col(c))) if _has_map(dtypes[c])
            else F.col(c) for c in data_cols]))
        w = Window.partitionBy(*keys).orderBy(
            F.col("__seq").desc(), F.col("__rank").desc(),
            F.col("__tie").desc(), F.col(ROW_KIND_COL).desc())
        tomb = (
            batch.withColumn("__seq", seq)
            .withColumn("__rank", rank)
            .withColumn("__tie", tie)
            .withColumn(ROW_KIND_COL,
                        F.when(F.col(ROW_KIND_COL) == "-U", "-D")
                        .otherwise(F.col(ROW_KIND_COL)))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*data_cols, F.col(ROW_KIND_COL).alias("__kind"))
        )
        upserts = tomb.filter(F.col("__kind") != "-D").drop("__kind")
        cur = self.read(spark)
        if cur is None:
            new = upserts
        else:
            untouched = cur.join(tomb.select(*keys), keys, "left_anti")
            new = untouched.unionByName(upserts, allowMissingColumns=True)
        return self.commit(new, partition_keys)


def _opt_list(v) -> list[str] | None:
    if v is None:
        return None
    if isinstance(v, str):
        return [s.strip() for s in v.split(",") if s.strip()]
    return list(v)


def _resolve_layout(plugin: str, opts: dict) -> tuple[str, list[str] | None,
                                                      list[str] | None]:
    """Map each connector's option names to (table path, primary keys,
    partition keys)."""
    get = opts.get
    if plugin == "Hudi":
        base = get("table_dfs_path") or get("warehouse")
        db = get("database", "default")
        table = get("table_name") or get("table")
        keys = _opt_list(get("record_key_fields"))
        parts = _opt_list(get("partition_fields"))
    elif plugin == "Paimon":
        base = get("warehouse")
        db = get("database", "default")
        table = get("table")
        keys = _opt_list(get("paimon.table.primary-keys")
                         or get("primary_keys") or get("primary-keys"))
        parts = _opt_list(get("paimon.table.partition-keys"))
    else:  # Iceberg
        cat = get("iceberg.catalog.config") or {}
        base = get("warehouse") or cat.get("warehouse")
        db = get("namespace") or get("database") or "default"
        table = get("table")
        keys = _opt_list(get("iceberg.table.primary-keys")
                         or get("primary_keys") or get("primary-keys"))
        parts = _opt_list(get("iceberg.table.partition-keys"))
    if not base or not table:
        raise ValueError(
            f"sink {plugin}: need warehouse/path and table "
            f"(got base={base!r}, table={table!r})")
    base = base.replace("file://", "")
    # s3a:// warehouse with fs.s3a.* creds (paimon.hadoop.conf /
    # iceberg hadoop conf): table I/O goes through the SigV4 REST
    # client via an _S3Mirror-backed local cache
    hconf = dict(get("paimon.hadoop.conf") or get("hadoop.conf") or {})
    cfp = get("conf_files_path")
    if not hconf.get("fs.s3a.endpoint") and cfp:
        # hudi declares hadoop config as a core-site.xml path
        # (s3_fake_to_hudi.conf + HudiSeatunnelS3MultiTableIT's
        # copyFileToContainer); pull the fs.s3a.* pairs out of it
        import xml.etree.ElementTree as _ET

        try:
            root_el = _ET.parse(str(cfp)).getroot()
            for prop in root_el.findall(".//property"):
                name = prop.findtext("name") or ""
                if name.startswith("fs."):
                    hconf.setdefault(name, prop.findtext("value"))
        except (OSError, _ET.ParseError):
            pass
    endpoint = hconf.get("fs.s3a.endpoint")
    if base.startswith(("s3a://", "s3://")) and endpoint:
        import hashlib
        import tempfile as _tf

        from seatunnel_spark.s3_fs import S3Client

        rest = base.split("://", 1)[1]
        bucket, _, sub = rest.partition("/")
        prefix = "/".join(x for x in (sub.strip("/"), str(db),
                                      str(table)) if x)
        cl = S3Client(str(endpoint), bucket,
                      str(hconf.get("fs.s3a.access-key")
                          or hconf.get("fs.s3a.access.key") or ""),
                      str(hconf.get("fs.s3a.secret-key")
                          or hconf.get("fs.s3a.secret.key") or ""))
        cache = os.path.join(
            _tf.gettempdir(), "st_s3_warehouse",
            hashlib.md5(f"{endpoint}/{bucket}".encode(),
                        usedforsecurity=False).hexdigest()[:12],
            str(db), str(table))
        return cache, keys, parts, _S3Mirror(cl, prefix)
    # other remote warehouses (hdfs://) map to local dirs via PATH
    # aliases in tests — the fs scheme is hadoop config, orthogonal to
    # the table/merge logic this backend implements
    from seatunnel_spark.sources.file import resolve_path_aliases

    base = resolve_path_aliases(base)
    return os.path.join(base, str(db), str(table)), keys, parts, None


class LakehouseSink(Sink):
    """Iceberg/Paimon/Hudi sink over the versioned-parquet backend."""

    NAME = "Iceberg"
    table_groups = None
    input_name = "sink"
    WANTS_CHANGELOG_META = True  # __offset is the merge order column

    def wants_observation(self) -> bool:
        return False  # merge path acts on its own frames

    def write(self, df: DataFrame) -> None:
        table_list = self.opt("table_list")
        if table_list:
            # per-table sink sub-configs (HudiSinkConfig table_list):
            # each entry merges over the base options and binds to the
            # matching source table group by table_name
            base = {k: v for k, v in self.options.items()
                    if k != "table_list"}
            groups = self.table_groups or {}
            for entry in table_list:
                merged = {**base, **entry}
                name = str(entry.get("table_name") or entry.get("table"))
                tdf = None
                for tid, g in groups.items():
                    if tid == name or tid.split(".")[-1] == name:
                        tdf = g
                        break
                sub = type(self)(merged)
                sub.plugin_name = self.plugin_name
                sub.input_name = name
                sub.source_ddl = getattr(self, "source_ddl", None)
                sub.write(tdf if tdf is not None else df)
            return
        if self.table_groups:
            src_keys = getattr(self, "source_keys", None)
            for tid, tdf in self.table_groups.items():
                sub = LakehouseSink(self.options)
                sub.plugin_name = self.plugin_name
                sub.input_name = tid
                if isinstance(src_keys, dict):
                    sub.source_keys = src_keys.get(tid) or src_keys.get(
                        tid.split(".")[-1])
                else:
                    sub.source_keys = src_keys
                sub.source_ddl = getattr(self, "source_ddl", None)
                sub.write(tdf)
            return
        opts = dict(self.options)
        tid_parts = self.input_name.split(".")
        for field in ("table", "database"):
            val = str(opts.get(field, ""))
            if "${table_name}" in val:
                val = val.replace("${table_name}", tid_parts[-1])
            if "${database_name}" in val:
                # catalog table path is db.table — the db segment feeds
                # the ${database_name} placeholder
                # (sink-options-placeholders.md)
                val = val.replace(
                    "${database_name}",
                    tid_parts[-2] if len(tid_parts) > 1 else "default")
            if val:
                opts[field] = val
        path, keys, parts, remote = _resolve_layout(self.plugin_name, opts)
        if not keys:
            # inherit the source-declared primary key (schema {
            # primaryKey { columnNames } } — the reference's paimon
            # sink builds its primary-key table from CatalogTable)
            src_keys = getattr(self, "source_keys", None)
            if isinstance(src_keys, dict):
                src_keys = src_keys.get(self.input_name) or src_keys.get(
                    self.input_name.split(".")[-1])
            keys = src_keys or []
        tbl = LakehouseTable(path, remote=remote)

        schema_mode = str(self.opt("schema_save_mode",
                                   "CREATE_SCHEMA_WHEN_NOT_EXIST")).upper()
        data_mode = str(self.opt("data_save_mode", "APPEND_DATA")).upper()
        if schema_mode == "ERROR_WHEN_SCHEMA_NOT_EXIST" and not tbl.exists():
            raise ValueError(f"{self.plugin_name}: table {path!r} missing "
                             "(ERROR_WHEN_SCHEMA_NOT_EXIST)")
        if schema_mode == "RECREATE_SCHEMA":
            tbl.drop()
        elif tbl.exists():
            if data_mode == "DROP_DATA":
                tbl.drop()
            elif data_mode == "ERROR_WHEN_DATA_EXISTS":
                cur = tbl.read(df.sparkSession)
                if cur is not None and cur.limit(1).count():
                    raise ValueError(f"{self.plugin_name}: table {path!r} "
                                     "has data (ERROR_WHEN_DATA_EXISTS)")

        ddl_map = getattr(self, "source_ddl", None) or {}
        if ddl_map and tbl.exists():
            from seatunnel_spark.sources.cdc_replay import (ddl_for_table,
                                                            parse_ddl_ops)

            ops = [op for ddl in ddl_for_table(
                ddl_map, self.input_name,
                (self.input_name or "").split(".")[-1])
                for op in parse_ddl_ops(ddl)]
            if ops:
                tbl.evolve(df.sparkSession, ops, parts)

        if tbl.exists():
            # incompatible-schema guard (PaimonSinkCDCIT
            # testSinkWithIncompatibleSchema: writing `name INT` into a
            # table whose actual schema is `name STRING` must FAIL, not
            # silently coerce through a union)
            cur_schema = {f.name: f.dataType for f
                          in (tbl.read(df.sparkSession) or df).schema.fields}
            from seatunnel_spark.types import ROW_KIND_COL as _RK

            for f in df.schema.fields:
                if f.name in (_RK, TABLE_ID_COL):
                    continue
                have = cur_schema.get(f.name)
                if have is not None and have.simpleString() != \
                        f.dataType.simpleString():
                    raise ValueError(
                        f"{self.plugin_name}: The source field with schema "
                        f"'{f.name} {f.dataType.simpleString().upper()}' is "
                        f"incompatible with the sink table's actual schema "
                        f"'{f.name} {have.simpleString().upper()}'. Please "
                        "check schema of sink table.")

        upsert = bool(self.opt("iceberg.table.upsert-mode-enabled")
                      or self.opt("upsert-mode-enabled"))
        from seatunnel_spark.types import EVENT_TS_COL

        order_col = self.opt("order_column") or (
            "__offset" if "__offset" in df.columns else None)
        drop = [c for c in (TABLE_ID_COL, EVENT_TS_COL) if c in df.columns]
        if order_col is None and "__offset" in df.columns:
            drop.append("__offset")
        body = df.drop(*drop) if drop else df
        wprops = dict(self.opt("paimon.table.write-props") or {})
        clog_producer = wprops.get("changelog-producer")
        if keys and (ROW_KIND_COL in body.columns or upsert):
            if ROW_KIND_COL not in body.columns:
                body = body.withColumn(ROW_KIND_COL, F.lit("+I"))
            ver = tbl.merge_apply(df.sparkSession, body, keys,
                                  order_col=order_col,
                                  partition_keys=parts)
            if clog_producer:
                # changelog-producer tables also materialize this
                # batch's event log for streaming readers
                tbl.record_changelog(
                    body.drop(*[c for c in (order_col,)
                                if c and c in body.columns]), ver)
        else:
            body = body.drop(ROW_KIND_COL) if ROW_KIND_COL in body.columns else body
            cur = tbl.read(df.sparkSession)
            new = body if cur is None else cur.unionByName(
                body, allowMissingColumns=True)
            ver = tbl.commit(new, parts)
            if clog_producer:
                # an all-insert batch is still changelog: +I per row
                tbl.record_changelog(
                    body.drop(*[c for c in (order_col,)
                                if c and c in body.columns])
                    .withColumn(ROW_KIND_COL, F.lit("+I")), ver)


class LakehouseSource(Source):
    """Read back the table HEAD (reference: connector-iceberg source
    batch scan of the current snapshot)."""

    NAME = "Iceberg"

    def read(self, spark: SparkSession):
        opts = dict(self.options)
        table_list = opts.pop("table_list", None)
        if table_list:
            out = {}
            for sub in table_list:
                merged = {**opts, **sub}
                out[sub["table"]] = self._read_one(spark, merged)
            if len(out) == 1:
                return next(iter(out.values()))
            return out
        return self._read_one(spark, opts)

    def read_stream(self, spark: SparkSession):
        """Streaming read = changelog catch-up microbatch (paimon
        streaming-read semantics: initial snapshot then per-snapshot
        diffs; bounded here — each call emits the changelog from
        `scan.snapshot-id` to HEAD, like one poll of the reference's
        continuous scan). A table written with changelog-producer set
        serves its RECORDED event log verbatim (PaimonSinkCDCIT
        testChangelogLookup: +I/-U/+U/-D rows in write order) instead
        of a snapshot diff."""
        opts = dict(self.options)
        if not opts.get("table_list"):
            path, _keys, _parts, remote = _resolve_layout(
                self.plugin_name, opts)
            clog = LakehouseTable(path, remote=remote) \
                .read_changelog_log(spark)
            if clog is not None:
                return clog
        return self.read(spark)

    def _read_one(self, spark: SparkSession, opts: dict) -> DataFrame:
        path, keys, _, remote = _resolve_layout(self.plugin_name, opts)
        scan_mode = str(opts.get("scan.mode")
                        or opts.get("paimon.scan.mode") or "").lower()
        if scan_mode in ("changelog", "streaming", "from-snapshot",
                         "changelog-from-snapshot"):
            from_v = opts.get("scan.snapshot-id")
            return LakehouseTable(path, remote=remote).read_changelog_since(
                spark, int(from_v) if from_v is not None else None,
                keys or [])
        df = LakehouseTable(path, remote=remote).read(spark)
        if df is None:
            raise FileNotFoundError(
                f"source {self.plugin_name}: no committed snapshot at {path!r}")
        query = opts.get("query")
        if query:
            # predicate/projection pushdown surface (PaimonSourceConfig
            # `query`): the filter confs read with a SQL statement over
            # the table name — Catalyst prunes/pushes into the scan
            table = str(opts.get("table"))
            df.createOrReplaceTempView(table)
            df = spark.sql(query)
        return df


LAKEHOUSE_NAMES = ["Iceberg", "Paimon", "Hudi", "hudi"]

__all__ = ["LakehouseTable", "LakehouseSink", "LakehouseSource",
           "LAKEHOUSE_NAMES"]
