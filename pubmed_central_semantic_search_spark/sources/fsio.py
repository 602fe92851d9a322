"""Driver-side filesystem utilities shared by the table modules
(catalog / locks / rebucket / snapshots): Hadoop ``FileSystem`` access
and tiny json-lines record IO. Split out of ``catalog.py`` in round 12
(verdict #4) — no behavior change; every name stays importable from
``catalog`` for compatibility.

These run on the DRIVER via the Hadoop FS API — HDFS/S3A/local alike —
and never launch a Spark job (round-8: metadata reads used to pay one
job per point-lookup probe)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _list_parquet_sizes(fs, hpath, jvm) -> tuple[list[int], bool]:
    """Recursive (sizes, has_subdir_files) over a table directory via the
    Hadoop FS API — works on any supported filesystem, not just local."""
    sizes: list[int] = []
    nested = False
    it = fs.listFiles(hpath, True)  # recursive
    base = hpath.toUri().getPath().rstrip("/")
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        if not p.getName().endswith(".parquet"):
            continue
        sizes.append(st.getLen())
        if p.getParent().toUri().getPath().rstrip("/") != base:
            nested = True
    return sizes, nested


def _read_small_json_lines(spark: SparkSession, dir_path: str) -> list[dict]:
    """DRIVER-SIDE read of a tiny json-lines record directory (layout
    records, snapshot manifests — a handful of lines BY DESIGN). The
    previous ``spark.read.json(...).collect()`` paid a whole Spark job
    per read: one job per point-lookup probe for the layout record, one
    per snapshot read for the manifest (round-8). Hadoop FS API
    throughout — HDFS/S3A/local alike."""
    import json as _json

    fs, hpath, jvm = _hadoop_fs(spark, dir_path)
    rows: list[dict] = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if (not st.isFile()) or name.startswith(("_", ".")):
            continue
        stream = fs.open(st.getPath())
        try:
            reader = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            line = reader.readLine()
            while line is not None:
                if line.strip():
                    rows.append(_json.loads(line))
                line = reader.readLine()
        finally:
            stream.close()
    return rows


def _read_small_file(spark: SparkSession, file_path: str) -> str | None:
    """DRIVER-SIDE read of ONE tiny text file (a write-stamp record),
    or None if absent. Tolerates the file vanishing between the exists
    probe and the open (a concurrent stamp PRUNE) — every stamp
    consumer that needs a quiescent read holds the table lock; racing
    readers retry at the protocol layer (``_read_table_stamp``)."""
    fs, hpath, jvm = _hadoop_fs(spark, file_path)
    if not fs.exists(hpath):
        return None
    try:
        stream = fs.open(hpath)
    except Exception as e:
        if "FileNotFoundException" in str(e):
            return None
        raise
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def _write_small_file_once(spark: SparkSession, file_path: str, text: str) -> None:
    """DRIVER-SIDE write of ONE tiny text file that is NEVER rewritten
    (write-stamp records are append-only: unique filename per record).
    Immutability is the point — a replace-in-place protocol
    (delete + rename) tore on Hadoop's local ChecksumFileSystem under
    concurrent replacers: the data file and its ``.crc`` sidecar move
    in two steps, so racing writers could pair one writer's data with
    another's checksum, a PERSISTENT ChecksumException (caught by this
    repo's own 16-thread stamp stress before it shipped). A file
    written once by one writer always carries its own crc."""
    fs, hpath, _ = _hadoop_fs(spark, file_path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _write_small_json_lines(
    spark: SparkSession, dir_path: str, rows: list[dict], filename: str
) -> None:
    """DRIVER-SIDE write of a tiny json-lines record directory (same
    directory-with-one-file layout the old ``coalesce(1).write.json``
    produced, so existing tables read back unchanged) — no Spark job."""
    import json as _json

    fs, hpath, jvm = _hadoop_fs(spark, dir_path)
    if fs.exists(hpath):
        fs.delete(hpath, True)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{dir_path}/{filename}"), True)
    try:
        payload = "".join(_json.dumps(r) + "\n" for r in rows)
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()

