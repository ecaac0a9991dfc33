package graft

import scala.collection.immutable.ListMap

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.analyze.{SchemaAnalyzer => SA}
import graft.dedup.Dedup
import graft.pipeline.Blueprint
import graft.schema._
import graft.similarity.Similarity

/** ScalaCheck properties for the engine's pure (driver-side) kernels —
  * everything here runs without a SparkSession. */
object GraftProps extends Properties("graft") {

  // ---------------------------------------------------------------- schema
  private val genColumnDef: Gen[ColumnDef] = for {
    key <- Gen.oneOf(true, false)
    cd <- Gen.oneOf(
      Gen.choose(1, 10000).map(CategoricalColumnDef(_, key)),
      Gen.const(NumericColumnDef(key)), Gen.const(DateColumnDef(key)),
      Gen.const(DateTimeColumnDef(key)), Gen.const(DurationColumnDef(key)),
      Gen.const(TimeColumnDef(key)), Gen.const(TextColumnDef(key)),
      Gen.const(OmitColumnDef(key)))
  } yield cd

  private val genName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(20))

  private val genTableSchema: Gen[TableSchema] = for {
    cols <- Gen.nonEmptyListOf(Gen.zip(genName, genColumnDef)).map(l => ListMap(l.distinctBy(_._1): _*))
    fks <- Gen.listOf(for {
      n <- Gen.choose(1, 3)
      c <- Gen.listOfN(n, genName)
      rc <- Gen.listOfN(n, genName)
      rt <- genName
    } yield ForeignKeyDef(c, rt, rc))
  } yield TableSchema(cols, fks)

  private val genSchema: Gen[Schema] =
    Gen.nonEmptyListOf(Gen.zip(genName, genTableSchema))
      .map(l => Schema(ListMap(l.distinctBy(_._1): _*)))

  property("schema JSON round-trips any generated schema") = forAll(genSchema) { s =>
    Schema.fromJson(Schema.toJson(s)) == s
  }

  property("primaryKey = exactly the key-flagged columns, in order") =
    forAll(genTableSchema) { ts =>
      ts.primaryKey == ts.columns.collect { case (n, cd) if cd.key => n }.toSeq
    }

  // ---------------------------------------------------------- heuristics
  property("batch-size heuristic: bounded [16, 16384], monotone in scale") =
    forAll(Gen.choose(1L, 10_000_000_000L), Gen.choose(0, 7)) { (n, s) =>
      val b0 = Blueprint.batchSizeHeuristic(n, s)
      val b1 = Blueprint.batchSizeHeuristic(n, s + 1)
      b0 >= 16 && b0 <= 16384 && b1 >= b0
    }

  property("plural heuristic never fires on ss/us/is endings or short tokens") =
    forAll(genName) { base =>
      !SA.isPluralName(base + "ss") && !SA.isPluralName(base + "us") &&
        !SA.isPluralName(base + "is") && !SA.isPluralName("xs")
    }

  // --------------------------------------------------------------- hashing
  property("minhash parameters: a != 0, both in [0, 2^61-1), deterministic") =
    forAll(Gen.choose(1, 64), Gen.choose(Long.MinValue, Long.MaxValue)) { (k, seed) =>
      val p = (1L << 61) - 1
      val h1 = Dedup.hashParams(k, seed)
      val h2 = Dedup.hashParams(k, seed)
      h1.sameElements(h2) && h1.forall { case (a, b) =>
        a > 0 && a < p && b >= 0 && b < p
      }
    }

  property("hyperplanes: deterministic per seed, components in [-1, 1]") =
    forAll(Gen.choose(1, 32), Gen.choose(1, 128), Gen.choose(Long.MinValue, Long.MaxValue)) {
      (planes, dim, seed) =>
        val a = Similarity.hyperplanes(planes, dim, seed)
        val b = Similarity.hyperplanes(planes, dim, seed)
        a.length == planes && a.head.length == dim &&
          (a, b).zipped.forall((x, y) => x.sameElements(y)) &&
          a.forall(_.forall(v => v >= -1.0 && v <= 1.0))
    }

  // ------------------------------------------------------------- metadata
  property("ColumnDefMeta round-trips any ColumnDef") = forAll(genColumnDef) { cd =>
    ColumnDefMeta.fromMetadata(ColumnDefMeta.toMetadata(cd)).contains(cd)
  }
}
