package graft

import graft.core.Span
import graft.taggers.{Tagger, TaggerModule, TaggerRegistry}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Custom-tagger module loading — the JVM analog of the reference's
  * `import_modules` + `taggers_modules` config
  * (core/utils.py:118-160, tests/python/test_extra.py). */
class TaggerModuleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("importModules: Scala-object form registers at init (test_extra.py:21-24)") {
    TaggerRegistry.importModules(Seq("graft.ExtraTaggersFromObject"))
    assert(TaggerRegistry.resolve("extra_v1").predict("abcd")
      .contains(Span(0, 4, "whole_doc", 1.0)))
  }

  test("importModules: TaggerModule class form (test_extra.py:26-28)") {
    TaggerRegistry.importModules(Seq("graft.ExtraTaggerModuleClass"))
    assert(TaggerRegistry.resolve("extra_v2").predict("xy")
      .contains(Span(0, 2, "whole_doc", 0.5)))
  }

  test("importModules: unknown module fails with the --jars hint") {
    val e = intercept[IllegalArgumentException] {
      TaggerRegistry.importModules(Seq("com.nowhere.NoSuchModule"))
    }
    assert(e.getMessage.contains("--jars"))
  }

  test("importModules is idempotent (import-once memo, utils.py:139-147)") {
    // the CLASS form is the one the memo actually protects: without it,
    // register() would run (and re-register) on every import
    TaggerRegistry.importModules(Seq("graft.ExtraTaggerModuleClass"))
    TaggerRegistry.importModules(Seq("graft.ExtraTaggerModuleClass"))
    assert(ExtraTaggerModuleClass.registerCalls.get() == 1)
  }

  test("end-to-end: config pipeline runs a custom tagger next to builtins (test_extra.py:34-48)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-extra").toString
    Seq(("d1", "hello world"), ("d2", "second doc"))
      .toDF("id", "content").write.parquet(s"$dir/input")
    val config =
      s"""{
         |  "input": {"format": "parquet", "path": "$dir/input",
         |            "id": "id", "text": "content"},
         |  "tagger_modules": ["graft.ExtraTaggersFromObject"],
         |  "taggers": ["c4_v2", "extra_v1"],
         |  "experiment": "test",
         |  "output": {"path": "$dir/out", "format": "parquet"},
         |  "attributes_output": "$dir/attrs"
         |}""".stripMargin
    Main.run(spark, new com.fasterxml.jackson.databind.ObjectMapper().readTree(config))
    val attrs = spark.read.parquet(s"$dir/attrs")
    val keys = attrs.select(explode(map_keys(col("attributes")))).as[String]
      .collect().toSet
    assert(keys.contains("test__extra_v1__whole_doc"))
    assert(keys.exists(_.startsWith("test__c4_v2__")))
  }
}

/** A user "extras" module in Scala-object form: registering is the
  * object initializer's side effect (the analog of the reference's
  * import-time `@TaggerRegistry.add` decorators). */
object ExtraTaggersFromObject {
  TaggerRegistry.register("extra_v1")(new Tagger {
    def name: String = "extra_v1"
    def predict(text: String, meta: Map[String, String]): Vector[Span] =
      Vector(Span(0, text.length.toLong, "whole_doc", 1.0))
  })
}

/** A user extras module in [[TaggerModule]] class form. The companion
  * object both counts register() calls for the idempotence test and
  * proves a companion does NOT shadow the class (importModules must still
  * run register()). */
class ExtraTaggerModuleClass extends TaggerModule {
  def register(): Unit = {
    ExtraTaggerModuleClass.registerCalls.incrementAndGet()
    TaggerRegistry.register("extra_v2")(new Tagger {
      def name: String = "extra_v2"
      def predict(text: String, meta: Map[String, String]): Vector[Span] =
        Vector(Span(0, text.length.toLong, "whole_doc", 0.5))
    })
  }
}

object ExtraTaggerModuleClass {
  val registerCalls = new java.util.concurrent.atomic.AtomicInteger(0)
}
