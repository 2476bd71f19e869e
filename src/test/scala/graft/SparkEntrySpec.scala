package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-contract integrity net: the failure modes that break the
  * correctness gate OUTSIDE any one operator — duplicate query names
  * (the map silently drops one), oracle entries for queries that don't
  * exist, and non-scalar output columns (the driver's pandas gate
  * cannot sort array/map/struct cells — a red gate with values that
  * were never wrong). Catch them at test time, not driver time.
  *
  * Constructing every query builds its full plan (and runs any eager
  * index/materialization steps) against sf0.001 — cheap, and the
  * schema check needs analysis only.
  */
class SparkEntrySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // the shared test session predates withExtensions — register the
  // same descriptors GraftExtensions injects (some gates use the
  // SQL-registered kernels)
  Seq(graft.plans.GraftExtensions.hammingDistanceDescriptor,
    graft.plans.GraftExtensions.dotProductDescriptor,
    graft.plans.GraftExtensions.winnowMinsDescriptor,
    graft.plans.GraftExtensions.shingleHash60Descriptor,
    graft.plans.GraftExtensions.vocabTokenCountDescriptor)
    .foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  test("query names are unique and oracle SQL strings are non-trivial") {
    val names = SparkEntry.all.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    // (oracle keys ⊆ query keys holds by construction — both derive
    // from SparkEntry.all — so that is NOT asserted here)
    val blank = SparkEntry.all.collect { case q if q.oracle.exists(_.trim.isEmpty) => q.name }
    assert(blank.isEmpty, s"blank oracle SQL: $blank")
  }

  test("every query's output schema is scalar-only and oracle-sortable") {
    val offenders = SparkEntry.all.flatMap { q =>
      val schema = q.run(spark, dir).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"non-scalar driver-facing columns (pandas gate cannot sort them): $offenders")
  }
}
