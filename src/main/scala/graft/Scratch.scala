package graft

import org.apache.spark.sql.SparkSession

/** Scratch-directory allocation + JVM-exit cleanup, shared by SparkEntry's
  * materialized caches and EventStream's chunked stream staging.
  *
  * Location is deployment-configurable: `spark.graft.scratch` if set, else a
  * `graft_scratch/` area under `spark.sql.warehouse.dir` — the
  * cluster-visible warehouse — NEVER driver-local java.io.tmpdir, which
  * executors on a real cluster cannot read. Every allocation is registered
  * for recursive delete at JVM exit through the Hadoop FileSystem of its
  * scheme, so repeated local runs do not leak directories.
  */
private[graft] object Scratch {

  def dir(s: SparkSession, prefix: String): String = {
    val base = s.conf.getOption("spark.graft.scratch")
      .getOrElse(s.conf.get("spark.sql.warehouse.dir") + "/graft_scratch")
    val out = s"$base/$prefix${java.util.UUID.randomUUID().toString.take(8)}"
    register(out, s.sparkContext.hadoopConfiguration)
    out
  }

  private val registered =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.hadoop.conf.Configuration]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.foreach { case (p, conf) =>
        try {
          val path = new org.apache.hadoop.fs.Path(p)
          path.getFileSystem(conf).delete(path, true)
        } catch { case _: Throwable => () }
      }))

  def register(path: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    hookInstalled
    registered.put(path, conf)
  }
}
