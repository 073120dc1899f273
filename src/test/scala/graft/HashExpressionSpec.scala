package graft

import graft.functions.PortableHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import scala.util.Random

/** Pins the fused Md5Long60 expression to the md5-chain form it
  * replaced: `conv(substring(md5(x), 1, 15), 16, 10)::long` — the
  * portable contract every DuckDB oracle reproduces. Any divergence
  * would silently break every hash-checked dedup/ANN oracle.
  */
class HashExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def chainMd5Long(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  private def chainSeeded(seed: Int, c: org.apache.spark.sql.Column) =
    conv(substring(md5(concat_ws("|", lit(seed), c)), 1, 15), 16, 10)
      .cast(LongType)

  // seeded random strings: ascii, multi-byte UTF-8 (incl. a
  // surrogate-pair emoji), and the '|' separator a byte fold could trip on
  private val alphabet =
    Vector("é", "ß", "中", "🙂", "|", " ", "\n", "a", "Zz9", "~!", "the quick")
  private def randomTexts(n: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      (0 until rnd.nextInt(30)).map(_ =>
        alphabet(rnd.nextInt(alphabet.size))).mkString
    }
  }

  test("fused md5Long matches the conv/substring/md5 chain") {
    val df = randomTexts(500, seed = 42L).toDF("s")
      .select(PortableHash.md5Long($"s").as("fused"),
        chainMd5Long($"s").as("chain"))
    assert(df.filter($"fused" =!= $"chain").isEmpty)
    // fixed probes: empty string, a long value cast to string
    val probe = Seq(("", 0L), ("abc", 1234567890123L)).toDF("s", "v")
      .select(
        PortableHash.md5Long($"s").as("f1"), chainMd5Long($"s").as("c1"),
        PortableHash.md5Long($"v").as("f2"), chainMd5Long($"v".cast("string")).as("c2"))
    probe.collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("fused seededLong matches the concat_ws md5 chain for all seeds") {
    val vals = Seq("x", "a longer shingle text", "中文 mixed", "42")
      .toDF("s")
    (0 until 12).foreach { seed =>
      val diff = vals.select(
        PortableHash.seededLong(seed, $"s").as("fused"),
        chainSeeded(seed, $"s").as("chain"))
        .filter($"fused" =!= $"chain")
      assert(diff.isEmpty, s"seed $seed diverged")
    }
    // longs hash via their decimal rendering, like concat_ws casts them
    val lvals = Seq(0L, 7L, 1152921504606846975L).toDF("v")
    val diff = lvals.select(
      PortableHash.seededLong(3, $"v").as("fused"),
      chainSeeded(3, $"v").as("chain")).filter($"fused" =!= $"chain")
    assert(diff.isEmpty)
    // NULL CONTRACT (scaladoc): null input → null, unlike the concat_ws
    // chain which hashes the bare seed — pinned so a change is deliberate
    val nulls = Seq(Option.empty[String]).toDF("s")
      .select(PortableHash.seededLong(3, $"s").as("fused"),
        PortableHash.md5Long($"s").as("unseeded"))
    assert(nulls.head().isNullAt(0) && nulls.head().isNullAt(1))
  }

  test("md5_long60 callable from SQL and null-safe") {
    import org.apache.spark.sql.SparkSession
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder().master("local[2]")
      .appName("graft-hash-ext-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = ext.sql(
        "SELECT md5_long60('abc') AS h, md5_long60(CAST(NULL AS STRING)) AS n")
        .head()
      // first 15 hex chars of md5('abc') = 900150983cd24fb
      assert(got.getLong(0) === java.lang.Long.parseLong("900150983cd24fb", 16))
      assert(got.isNullAt(1))
      val seeded = ext.sql("SELECT md5_long60('abc', '3|') AS h").head().getLong(0)
      val expect = org.apache.commons.codec.digest.DigestUtils.md5Hex("3|abc")
      assert(seeded === java.lang.Long.parseLong(expect.take(15), 16))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
