package graft.sources

/** Repo-root-relative resolution for checked-in artifacts and scratch
  * dirs (r12 ADVICE: `Wordpiece.vocab30kPath` was a hardcoded absolute
  * `/root/repo/...` — engine AND oracle broke in any other checkout).
  *
  * Resolution order: `GRAFT_REPO_ROOT` env var, `graft.repo.root` system
  * property, then the process working directory (the driver contract —
  * Verify/Bench/sbt all run from the repo root). The result is absolute,
  * so the DuckDB oracle can interpolate the SAME derived path into
  * `read_csv`/`read_parquet` and both engines keep sharing one file with
  * zero transcription.
  */
object Artifacts {

  lazy val repoRoot: String =
    sys.env.get("GRAFT_REPO_ROOT")
      .orElse(sys.props.get("graft.repo.root"))
      .getOrElse(new java.io.File(".").getCanonicalPath)

  /** Absolute path of a repo-relative file or directory. */
  def path(rel: String): String = s"$repoRoot/$rel"
}
