package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.chschema.DdlRenderer

/**
 * Property tests over the DDL renderer (SURVEY.md §5 test plan item 2):
 * random schema trees must render with balanced parens, every leaf name
 * present, pk never wrapped in Nullable, and a stable frame.
 */
class DdlRendererPropSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val nameGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)

  private val scalarGen: Gen[DataType] = Gen.oneOf(
    BooleanType, IntegerType, LongType, FloatType, DoubleType, StringType,
    BinaryType, DateType, TimestampType)

  private def dtGen(depth: Int): Gen[DataType] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      6 -> scalarGen,
      1 -> Gen.lzy(for {
        n <- Gen.chooseNum(1, 3)
        fs <- Gen.listOfN(n, fieldGen(depth - 1))
      } yield StructType(fs)),
      1 -> Gen.lzy(dtGen(depth - 1).map(ArrayType(_, containsNull = true))),
      1 -> Gen.lzy(for {
        k <- scalarGen
        v <- dtGen(depth - 1)
      } yield MapType(k, v)))

  private def fieldGen(depth: Int): Gen[StructField] =
    for { n <- nameGen; dt <- dtGen(depth) } yield StructField(n, dt)

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.chooseNum(1, 6)
    fs <- Gen.listOfN(n, fieldGen(2))
  } yield StructType(fs)

  test("parens balance, frame stable, leaves present, pk bare") {
    check(Prop.forAll(schemaGen, nameGen) { (schema: StructType, pk: String) =>
      val out = DdlRenderer.render(schema, "t", pk)
      val balanced = out.count(_ == '(') == out.count(_ == ')')
      val framed = out.startsWith("drop table if exists t;\ncreate table t (\n") &&
        out.endsWith(s") engine = MergeTree() primary key ($pk);\n")
      val leaves = schema.fields.forall(f => out.contains(f.name))
      val pkBare = !out.linesIterator.exists(l =>
        l.trim.stripPrefix(", ").startsWith(s"$pk Nullable(") &&
          schema.fields.exists(f => f.name == pk && !f.dataType.isInstanceOf[StructType]
            && !f.dataType.isInstanceOf[ArrayType] && !f.dataType.isInstanceOf[MapType]))
      balanced && framed && leaves && pkBare
    })
  }

  test("rendering is deterministic") {
    check(Prop.forAll(schemaGen) { schema: StructType =>
      DdlRenderer.render(schema, "t", "k") == DdlRenderer.render(schema, "t", "k")
    })
  }
}
