package graft.util

/** Tiny JSON-sidecar IO for persisted index layouts (MinHash bands, LSH
  * buckets, IVF lists). All IO goes through the Hadoop FileSystem of the
  * index path — java.nio would silently target the LOCAL filesystem for an
  * hdfs://-or-s3a:// index, leaving the index without its guard (and the
  * validators no-op when the sidecar is absent: exactly the silent
  * parameter-mismatch failure the sidecar exists to prevent).
  */
object Sidecar {

  def write(
      conf: org.apache.hadoop.conf.Configuration,
      dir: String,
      name: String,
      json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(
      conf: org.apache.hadoop.conf.Configuration,
      dir: String,
      name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Require that a stored sidecar (if present) matches the parameters of
    * the current call; `what` names the index family in the error.
    */
  def requireMatch(
      conf: org.apache.hadoop.conf.Configuration,
      dir: String,
      name: String,
      expectedJson: String,
      what: String): Unit =
    read(conf, dir, name).foreach { stored =>
      require(stored == expectedJson,
        s"$what at $dir was written with $stored but this call uses " +
          s"$expectedJson — probing/appending would silently miss results")
    }
}
