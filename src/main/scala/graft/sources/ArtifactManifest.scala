package graft.sources

/** Compatibility stamps for the persisted artifact families (BPE
  * vocab, IVF-PQ index, streaming logs derived from them).
  *
  * The failure this prevents is silent unit drift: a token log counted
  * under vocab v1 mixing with v2 counts reads as a budget shift that
  * never happened; an index whose codes were written by one training
  * run but probed with another run's codebooks returns quiet garbage.
  * Each artifact carries a one-row manifest — WHAT it is, a
  * fingerprint of its own CONTENT, and a fingerprint of what it was
  * BUILT FROM — and loaders verify content against the stamp.
  * Derived logs carry the producing artifact's content fingerprint on
  * every row, so a consumer can refuse a log that mixes vocabularies
  * or no longer matches the shipped artifact.
  *
  * Stored as `_graft_manifest.json` inside the artifact directory:
  * underscore-prefixed files are invisible to Spark's parquet reader
  * (the `_SUCCESS` convention), so stamping never perturbs the data
  * read path, and a manifest-less legacy artifact keeps loading
  * (verification is best-effort on absence, strict on presence). */
object ArtifactManifest {

  final case class Stamp(artifact: String, contentFp: String, builtFrom: String)

  val FileName = "_graft_manifest.json"

  /** Hex md5 of a canonical string — the fingerprint everywhere. */
  def fp(canonical: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }

  def write(artifactDir: String, stamp: Stamp): Unit = {
    val json =
      s"""{"artifact": "${esc(stamp.artifact)}", "content_fp": "${esc(stamp.contentFp)}", "built_from": "${esc(stamp.builtFrom)}"}"""
    val f = new java.io.File(artifactDir, FileName)
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.print(json) finally w.close()
  }

  private val Field = """"([a-z_]+)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  def read(artifactDir: String): Option[Stamp] = {
    val f = new java.io.File(artifactDir, FileName)
    if (!f.exists()) None
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val json = try src.mkString finally src.close()
      val m = Field.findAllMatchIn(json)
        .map(mm => mm.group(1) -> mm.group(2).replace("\\\"", "\"").replace("\\\\", "\\"))
        .toMap
      for (a <- m.get("artifact"); c <- m.get("content_fp"); b <- m.get("built_from"))
        yield Stamp(a, c, b)
    }
  }

  /** Strict-on-presence verification: a stamped artifact whose loaded
    * content no longer matches its own manifest is corrupted or
    * half-replaced — fail loud; an unstamped one loads as before. */
  def verifyContent(artifactDir: String, expectedArtifact: String,
                    loadedContentFp: String): Unit =
    read(artifactDir).foreach { s =>
      require(s.artifact == expectedArtifact,
        s"$artifactDir is stamped '${s.artifact}', expected '$expectedArtifact'")
      if (s.contentFp != loadedContentFp)
        throw new IllegalStateException(
          s"$artifactDir content fingerprint ${loadedContentFp.take(12)}… does not match " +
            s"its manifest ${s.contentFp.take(12)}… — artifact corrupted or partially replaced")
    }
}
