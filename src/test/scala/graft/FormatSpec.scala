package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Source-format parity: the engine's queries read whatever the writer
  * chose, so the loaders' semantics must survive a round-trip through every
  * bundled columnar/row format (parquet is the driver's choice; ORC, JSON
  * and CSV are the other formats a 100 TB lake realistically lands in).
  * Each round-trip re-reads with the ORIGINAL schema applied (schema drift
  * is SchemasSpec's subject — here the content must be bit-identical).
  */
class FormatSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() === b.count())
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-format-$tag").toString + "/out"

  test("documents round-trip through ORC bit-identically") {
    val dir = tmpDir("orc")
    docs.write.orc(dir)
    assertSameRows(docs, spark.read.schema(docs.schema).orc(dir))
  }

  test("documents round-trip through JSON lines bit-identically") {
    val dir = tmpDir("json")
    docs.write.json(dir)
    assertSameRows(docs, spark.read.schema(docs.schema).json(dir))
  }

  test("documents round-trip through quoted CSV bit-identically") {
    val dir = tmpDir("csv")
    docs.write.option("header", "true").option("quoteAll", "true").csv(dir)
    assertSameRows(docs,
      spark.read.schema(docs.schema).option("header", "true").csv(dir))
  }

  test("a registered query computes identically over a re-landed ORC copy") {
    // re-land the whole sf dir's documents as ORC, point the same engine
    // code at it via a parquet shim dir, and compare a real query
    val q = graft.core.QueryRegistry.byName("tx_token_count")
    val fromParquet = q.fn(spark, sf).collect().toSeq
    val dir = Files.createTempDirectory("graft-format-reland").toString
    // copy the non-document tables as parquet links, documents via ORC
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "embeddings")
    names.foreach { n =>
      spark.read.parquet(s"$sf/$n.parquet").write.parquet(s"$dir/$n.parquet")
    }
    val orcDir = tmpDir("reland-docs")
    docs.write.orc(orcDir)
    spark.read.schema(docs.schema).orc(orcDir).write.parquet(s"$dir/documents.parquet")
    assert(q.fn(spark, dir).collect().toSeq === fromParquet)
  }
}
