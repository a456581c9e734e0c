package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the classic remedy for HOT-KEY skew in a
  * big ⋈ big shuffle join, packaged as a reusable operator.
  *
  * Problem shape: `facts ⋈ facts` on a key whose frequency is heavily
  * skewed (one user, one null-ish sentinel, one viral document). A
  * plain shuffle join hashes every row of a hot key to ONE reducer;
  * at 100 TB one task receives the hot key's entire population and
  * runs for hours while the other 9 999 finish in seconds. Spark's
  * AQE skew-join handles the SORT-MERGE case adaptively when it can
  * (splitting oversized partitions whose halves meet only a
  * replicable build side), so reach for this operator when AQE
  * cannot: aggregations layered over the join that pin the
  * partitioning, hinted shuffled-hash joins, or a skew profile known
  * AHEAD of time (the usual case in a curated pipeline).
  *
  * Mechanics (`probe ⋈ build` on `key`, `salts = S`):
  *  - probe side: each row gets a DETERMINISTIC salt in `[0, S)` —
  *    `pmod(hash(row-identity columns), S)` — splitting every hot key
  *    into S shuffle partitions. No `rand()`: nondeterministic salts
  *    break task retries (a replayed task re-salts differently and
  *    duplicates/loses rows — the classic streaming-recovery bug) and
  *    every result would be unreproducible run-to-run.
  *  - build side: replicated S× via `explode(sequence(0, S-1))`, so
  *    each (key, salt) probe partition finds its build rows locally.
  *  - join on `(key, salt)`, then drop the salt.
  *
  * Cost model: the build side is replicated S times — salting pays
  * when `|build| × S ≪ |probe's hot-key population|`, the usual
  * dimension-ish or same-order-fact case. Correctness is
  * layout-independent (the salt is an equi-key refinement), proven
  * result-identical to the plain join in SaltedJoinSpec, which also
  * pins the skew spread: the hot key's rows land in S distinct tasks.
  */
object SaltedJoin {

  /** Inner equi-join `probe ⋈ build` on `keys`, salted `salts` ways.
    *
    * @param saltBy probe columns whose hash spreads rows across
    *               salts; defaults to ALL probe columns (row
    *               identity). Pass the finest-grained stable id
    *               columns available — a constant salt input would
    *               put every row back in one partition.
    */
  def join(probe: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int, saltBy: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "at least one join key required")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // __salt is this operator's reserved working column: silently
    // overwriting a user column of that name (and then dropping it)
    // would break the result-identical-to-plain-join contract
    require(!(probe.columns ++ build.columns).contains("__salt"),
      "input already has a __salt column; rename it before salting")
    val saltCols: Seq[Column] = {
      // hash() rejects MapType ANYWHERE in the type tree (SPARK-27619)
      // — a map nested inside a struct or array fails analysis just
      // like a top-level one
      def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
        case _: org.apache.spark.sql.types.MapType => true
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.exists(f => hasMap(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
        case _ => false
      }
      val names =
        if (saltBy.nonEmpty) saltBy
        // row-identity default: all probe columns except map-carrying
        // ones — a map column is never the only stable identity
        else probe.schema.fields.collect {
          case f if !hasMap(f.dataType) => f.name
        }.toSeq
      require(names.nonEmpty,
        "no hashable salt columns: pass saltBy explicitly")
      names.map(col)
    }
    val saltedProbe = probe.withColumn("__salt",
      pmod(hash(saltCols: _*), lit(salts)))
    val explodedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(explodedBuild, keys :+ "__salt").drop("__salt")
  }
}
