package graft

import java.nio.file.Files

/** Scratch-directory lifecycle for engine fixtures and benches.
  *
  * Bench invokes every fixture three times per session and Verify once
  * more; a leaked temp dir per invocation (~20 fixtures × 3 passes, plus
  * streaming checkpoints and backend logs inside them) accumulates tens
  * of directories of parquet + checkpoint state in the shared /tmp over
  * one driver run — interference the official bench then measures as
  * "engine time". Every fixture creation goes through [[withDir]], which
  * guarantees deletion on completion; nothing may return a LAZY plan
  * that still reads the scratch files (fixtures eagerly collect their
  * bounded rollups into a LocalRelation before the dir is removed — see
  * EngineE2E.localized).
  */
object Scratch {
  def dir(prefix: String): String = Files.createTempDirectory(prefix).toString

  /** Recursive best-effort delete — reclaiming a scratch dir must never
    * turn a green fixture into an error path. WAL writers under the dir
    * close first: each holds an open FileChannel, and hundreds of
    * fixture backends per test/bench session would otherwise leak a
    * file descriptor per table WAL. */
  def delete(root: String): Unit = {
    graft.backend.WalStore.closeUnder(root)
    def rec(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rec)
      f.delete(); ()
    }
    rec(new java.io.File(root))
  }

  def withDir[T](prefix: String)(f: String => T): T = {
    val d = dir(prefix)
    try f(d) finally delete(d)
  }
}
