package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GBMatrix, Monoid}

/** Reader/writer for the reference's demo matrix format: whitespace-separated
  * `i j x` triplets, one entry per line, 0- or 1-based indices
  * (/root/reference/Demo/Include/read_matrix.c:58 `one_based` flag; the
  * bundled Demo/Matrix files). The scan is a plain distributed text read
  * with column pruning, splittable at scale.
  */
object TripletReader {

  def read(spark: SparkSession, path: String, oneBased: Boolean = false,
           dup: Monoid = Monoid.Plus): GBMatrix = {
    val off = if (oneBased) 1L else 0L
    val raw = spark.read.text(path)
      // drop comment/header lines (MatrixMarket '%%...' banners, '#' comments)
      // BEFORE the ANSI-mode numeric casts below, which would otherwise throw
      .filter(!trim(col("value")).startsWith("%") &&
        !trim(col("value")).startsWith("#"))
      .select(split(trim(col("value")), "\\s+").as("f"))
      .filter(size(col("f")) >= 2 && element_at(col("f"), 1) =!= "")
    GBMatrix.fromTuples(raw.select(
      (element_at(col("f"), 1).cast("long") - off).as("src"),
      (element_at(col("f"), 2).cast("long") - off).as("dst"),
      // get() is 0-based and yields null (not an ANSI error) when the
      // weight column is absent — pattern-only triplet lines get w=1
      coalesce(get(col("f"), lit(2)).cast("double"), lit(1.0)).as("w")), dup)
  }

  /** MatrixMarket coordinate reader (the reference bundles
    * Demo/Matrix/cover.mtx — 1-based, `%%MatrixMarket` banner, a dims line,
    * then `i j [x]` entries; `symmetric` in the banner stores only one
    * triangle). Line order within a text file is recovered via zipWithIndex
    * (splits are offset-ordered), so the dims line — the first non-comment
    * line — is identified distributively, not by a driver-side file read.
    * Returns (matrix, nrows, ncols).
    */
  def readMatrixMarket(spark: SparkSession, path: String,
                       dup: Monoid = Monoid.Plus): (GBMatrix, Long, Long) = {
    val lines = spark.read.text(path).rdd.map(_.getString(0)).zipWithIndex()
      .filter { case (l, _) => l.trim.nonEmpty }
    val banner = lines.map { case (l, i) => (i, l) }.sortByKey().first()._2
    // banner: %%MatrixMarket matrix coordinate <field> <symmetry> — tokenize
    // rather than substring-match ("symmetric" is a substring of
    // "skew-symmetric", which needs its mirrored weights NEGATED)
    val tok = banner.trim.toLowerCase.split("\\s+")
    val field = tok.lift(3).getOrElse("real")
    val symKind = tok.lift(4).getOrElse("general")
    require(field != "complex", s"unsupported MatrixMarket field '$field' (no complex domain)")
    require(Set("general", "symmetric", "skew-symmetric", "hermitian")(symKind),
      s"unsupported MatrixMarket symmetry '$symKind'")
    // real-valued hermitian == symmetric (complex is rejected above)
    val symmetric = symKind == "symmetric" || symKind == "hermitian"
    val skew = symKind == "skew-symmetric"
    val data = lines.filter { case (l, _) => !l.trim.startsWith("%") }
    val dimsIdx = data.map(_._2).min()
    val dimsTok = data.filter(_._2 == dimsIdx).first()._1.trim.split("\\s+")
    val (nrows, ncols) = (dimsTok(0).toLong, dimsTok(1).toLong)
    import spark.implicits._
    val entries = data.filter(_._2 != dimsIdx).map(_._1).toDF("value")
      .select(split(trim(col("value")), "\\s+").as("f"))
      .select((element_at(col("f"), 1).cast("long") - 1).as("src"),
        (element_at(col("f"), 2).cast("long") - 1).as("dst"),
        coalesce(get(col("f"), lit(2)).cast("double"), lit(1.0)).as("w"))
    val full =
      if (symmetric || skew) {
        val mirroredW = if (skew) -col("w") else col("w")
        entries.unionByName(entries.filter(col("src") =!= col("dst"))
          .select(col("dst").as("src"), col("src").as("dst"), mirroredW.as("w")))
      } else entries
    (GBMatrix.fromTuples(full, dup), nrows, ncols)
  }

  def write(m: GBMatrix, path: String, oneBased: Boolean = false): Unit = {
    val off = if (oneBased) 1L else 0L
    m.df.select(concat_ws(" ", col("src") + off, col("dst") + off, col("w")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
