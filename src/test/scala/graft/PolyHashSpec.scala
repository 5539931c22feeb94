package graft

import graft.plans.{GraftExtensions, PolyHash}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native PolyHash expression: value pins vs an independent
  * implementation, interpreted-vs-codegen agreement, and SQL
  * registration through the extension descriptor. */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference (different shape on purpose). */
  private def ref(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))

  test("value pins and reference agreement") {
    assert(PolyHash.hashUTF8(UTF8String.fromString("")) == 0L)
    assert(PolyHash.hashUTF8(UTF8String.fromString("a")) == 97L)
    assert(PolyHash.hashUTF8(UTF8String.fromString("ab")) == 97L * 31 + 98)
    for (s <- Seq("spark", "the quick brown fox", "ünïcødé ✓", "a" * 10000))
      assert(PolyHash.hashUTF8(UTF8String.fromString(s)) == ref(s), s)
  }

  test("interpreted eval == codegen path over real data") {
    val viaCodegen = Tables.t(spark, sf0001, "documents")
      .select($"doc_id", PolyHash.poly_hash($"text").as("h"))
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaInterpreter = Tables.t(spark, sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), PolyHash(Literal(r.getString(1))).eval(null).asInstanceOf[Long]))
      .sortBy(_._1)
    assert(viaCodegen.toSeq == viaInterpreter.toSeq)
  }

  test("null input yields null, wrong type rejected") {
    val out = Seq(Option.empty[String], Some("x")).toDF("s")
      .select(PolyHash.poly_hash($"s").as("h")).collect()
    assert(out(0).isNullAt(0) && out(1).getLong(0) == 120L)
    assertThrows[Exception] {
      Seq(1).toDF("i").select(PolyHash.poly_hash($"i")).collect()
    }
  }

  test("extension descriptor registers poly_hash for SQL text") {
    val (id, info, builder) = PolyHash.fnDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val h = spark.sql("SELECT poly_hash('spark') AS h").as[Long].head()
    assert(h == ref("spark"))
    // the extension class wires the same descriptor
    new GraftExtensions() // constructs; applied via spark.sql.extensions in prod
  }
}
