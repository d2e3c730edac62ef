package graft

/** Regression-pin oracles, loaded from generated classpath resources
  * (`src/main/resources/pins/<query>.sql`, emitted by tools/gen_pins.py).
  *
  * These are literal VALUES oracles for queries whose defining arithmetic
  * cannot be re-expressed in DuckDB SQL (S2/H3 cell ids, FNV/splitmix hash
  * families, sign-LSH bucketing, BMP pixel decode). The underlying
  * implementations are independently verified in ScalaTest (S2 exact
  * round-trip sweeps, simhash/minhash brute-force spec tests, javax.imageio
  * BMP decode oracle); the pins freeze the observed-correct output on the
  * fixed driver testdata so the correctness gate catches regressions. Each
  * pin carries branches for the two verification scale factors selected on
  * count(orders); at any other SF the pin is empty and the row-count compare
  * fails loudly rather than silently passing.
  */
object OracleLiterals {

  val pinned: Seq[String] = Seq(
    "q_image_s2cells", "q_image_hex7cells", "q_emb_pq_topk",
    // q_doc_simhash / q_doc_fingerprints were pins through round 3,
    // q_emb_lsh_topk through round-4 session 5, and q_traj_simplify
    // (Douglas-Peucker) through session 6; all are now TRUE SQL oracles in
    // OracleSql (FNV-1a + banding / rolling hash / splitmix hyperplanes in
    // DuckDB HUGEINT arithmetic; DP as a recursive-split CTE whose
    // first-max argmax is list_position(list_max))
    // (q_audio_features was promoted in round-4 session 7: the full-corpus
    // PCM decode re-derived via an (A^j, T_j) power table in HUGEINT —
    // rms is exact because Σv² < 2^41 and sqrt is IEEE-exact)
    "q_doc_token_hll",
    // (q_image_psnr was promoted in round 5: the gated surface moved from
    // centi-dB, which needs log10, to exact integer SSE facts — lossless
    // bit-exactness and the 40 dB contract as the integer compare
    // 10⁴·sse ≤ 255²·npix — all first-principles-derivable in SQL)
    "q_image_features",
    // golden-file replays: static reference data (sfDir-independent), pinned
    // because the driver's DuckDB sees only the sf parquet tables, not the
    // reference's GeoJSON files
    // (q_image_thumbs and q_audio_downsample were promoted in round-4
    // session 7 — integer-div resize / odd-j slice over closed-form
    // payloads, fully SQL-derivable)
    "q_golden_alpine", "q_golden_sf_summary", "q_golden_corpus")

  private def load(name: String): Option[String] = {
    val in = getClass.getResourceAsStream(s"/pins/$name.sql")
    if (in == null) {
      // bootstrap path: a freshly-pinned query has no resource until
      // tools/gen_pins.py runs on the first Verify dump — warn, don't die
      System.err.println(s"[pins] missing resource /pins/$name.sql — query will be rows-only")
      None
    } else
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
  }

  lazy val pins: Map[String, String] =
    pinned.flatMap(n => load(n).map(n -> _)).toMap
}
