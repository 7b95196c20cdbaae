package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, expressed
  * with higher-order functions (`zip_with` / `aggregate`) — codegen'd,
  * no UDF serialization, safe for 100 TB scans. All math in double for
  * cross-engine determinism (left-to-right fold = sequential sum).
  */
object VectorFunctions {

  private def d(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (avoids the sqrt when only ranking matters). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Sign-bit bucket for random-hyperplane LSH: bit j = 1 iff
    * dot(v, plane_j) > 0, packed into a long. Planes are passed as
    * literal arrays so the whole expression is constant-folded against
    * the scan.
    */
  def hyperplaneBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val plane = array(p.map(lit).toIndexedSeq: _*)
      when(dot(v, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
