package graft.table

/** Shared first-argument resolution for the SQL table functions
  * (`graft_history` / `graft_files` / `graft_changes`): the argument
  * is EITHER a filesystem table root (the original form) or a catalog
  * identifier `cat[.ns…].table` of a configured [[GraftCatalog]] —
  * the form every other SQL admin statement (OPTIMIZE/VACUUM/…)
  * already takes, so `SELECT * FROM graft_history('g.events')` works
  * without the caller knowing where the warehouse lives.
  *
  * Disambiguation is by CATALOG LOOKUP, never by syntax guessing: the
  * string is treated as an identifier exactly when its first
  * dot-segment names a session catalog configured as a GraftCatalog
  * (`spark.sql.catalog.<cat> = graft.table.GraftCatalog`). Anything
  * else — including dotted directory names — falls through to the
  * path form unchanged, so no existing query can change meaning.
  *
  * Trust model: identifier form resolves under the catalog's own
  * warehouse with the SAME per-segment traversal guard as
  * [[GraftCatalog]] (no empty/`.`/`..`/separator segments), so it is
  * warehouse-contained by construction and exempt from the
  * `spark.graft.sql.history.root` conf; the path form keeps that
  * optional containment check, exactly as before.
  */
private[table] object GraftTvf {

  /** Resolve a TVF root argument; enforces the containment conf for
    * path-form arguments.
    */
  def resolveRoot(fnName: String, raw: String): String =
    resolveIdent(raw) match {
      case Some(root) => root
      case None =>
        val session = org.apache.spark.sql.SparkSession.active
        Option(session.conf.get("spark.graft.sql.history.root", null))
          .filter(_.nonEmpty).foreach { allow =>
            val rootN = java.nio.file.Paths.get(raw).normalize().toString
            val allowN = java.nio.file.Paths.get(allow).normalize()
              .toString.stripSuffix("/")
            require(rootN == allowN || rootN.startsWith(allowN + "/"),
              s"$fnName: path '$raw' is outside the configured " +
                s"spark.graft.sql.history.root '$allow'")
          }
        raw
    }

  private def resolveIdent(raw: String): Option[String] = {
    if (raw.contains("/") || raw.contains("\\") || raw.contains(":"))
      return None // URI or path — never an identifier
    val segs = raw.split("\\.", -1).toSeq
    if (segs.length < 2) return None // a bare name is a relative path
    val session = org.apache.spark.sql.SparkSession.active
    val cat = segs.head
    val cls = session.conf.get(s"spark.sql.catalog.$cat", null)
    if (cls == null || cls != classOf[GraftCatalog].getName) return None
    val wh = session.conf.get(s"spark.sql.catalog.$cat.warehouse", null)
    require(wh != null && wh.nonEmpty,
      s"catalog '$cat' has no spark.sql.catalog.$cat.warehouse")
    val rest = segs.tail
    // the GraftCatalog.rootFor traversal guard, applied here too
    rest.foreach { s =>
      require(s.nonEmpty && s != "." && s != ".." &&
          !s.contains("/") && !s.contains("\\") && !s.contains(":"),
        s"graft catalog: illegal identifier segment '$s' — segments " +
          "must not be empty, '.', '..', or contain path separators")
    }
    Some(rest.mkString(wh.stripSuffix("/") + "/", "/", ""))
  }
}
