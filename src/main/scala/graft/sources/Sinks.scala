package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Side-effecting sinks re-expressed for Spark's job-scoped write model.
  *
  * The reference appends JSONL records across runs from every worker
  * (common/io/save_jsonl_op.py:18-19, save_output_op.py:25-26) and uploads
  * binaries to MinIO (common/io/minio_upload_op.py:29-41). Spark-native
  * equivalents:
  *  - append-JSONL → `mode("append").json(runDir)`: each run lands new
  *    part-files; readers glob the root, giving cross-run append semantics
  *    without ever rewriting history (SURVEY §7 "what's hard" #4);
  *  - binary/object-store sink → `mapPartitions` against a pluggable
  *    [[ObjectStore]], returning per-object status ROWS (errors are data,
  *    the reference's convention) rather than failing the job. A production
  *    store points at s3a://; tests use the local-FS store.
  */
object Sinks {

  /** Append-mode JSONL: returns the directory written. */
  def appendJsonl(df: DataFrame, rootDir: String): String = {
    df.write.mode("append").json(rootDir)
    rootDir
  }

  /** Read the accumulated JSONL root back (all runs). */
  def readJsonl(spark: SparkSession, rootDir: String, schema: String): DataFrame =
    spark.read.schema(schema).json(rootDir)

  /** Pluggable object-store boundary (MinIO/S3 stand-in).
    * Ref: common/io/minio_upload_op.py:14-43. */
  trait ObjectStore extends Serializable {
    def put(key: String, bytes: Array[Byte]): Unit
  }

  /** Local-FS store used by tests and local pipelines. */
  final class LocalFsStore(root: String) extends ObjectStore {
    def put(key: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(root, key)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
    }
  }

  /** Production object-store path: Hadoop-FileSystem-backed, so the same
    * class serves `s3a://bucket/prefix` on a cluster with the S3A
    * connector on the classpath (the reference MinIO endpoint/credentials
    * map onto `fs.s3a.endpoint` / `fs.s3a.access.key` /
    * `fs.s3a.secret.key` via `confProps`) and `file:///...` in tests —
    * config-injected, no code change between the two.
    * Ref: common/io/minio_upload_op.py:14-43.
    *
    * The FileSystem handle is rebuilt lazily per executor JVM
    * (Configuration is not serializable); Hadoop's FileSystem cache
    * dedups instances per (scheme, authority, ugi). */
  final class HadoopFsStore(rootUri: String,
                            confProps: Map[String, String] = Map.empty)
    extends ObjectStore {
    @transient private lazy val fsAndRoot = {
      val conf = new org.apache.hadoop.conf.Configuration()
      confProps.foreach { case (k, v) => conf.set(k, v) }
      val p = new org.apache.hadoop.fs.Path(rootUri)
      (p.getFileSystem(conf), p)
    }
    def put(key: String, bytes: Array[Byte]): Unit = {
      val (fs, root) = fsAndRoot
      val out = fs.create(new org.apache.hadoop.fs.Path(root, key), true)
      try out.write(bytes) finally out.close()
    }
  }

  /** Upload (key, bytes) rows; emits per-object status rows with errors as
    * data (`uploaded`, `upload_error`), executed distributed via
    * mapPartitions — no driver-side loops.
    * Ref: common/io/save_image_op.py:40-54, minio_upload_op.py:29-41. */
  def writeBinary(df: DataFrame, keyCol: String, bytesCol: String,
                  store: ObjectStore): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (key, bytes) =>
          try { store.put(key, bytes); (key, true, null: String) }
          catch { case e: Exception => (key, false, e.getMessage) }
        }
      }
      .toDF("key", "uploaded", "upload_error")
  }
}
