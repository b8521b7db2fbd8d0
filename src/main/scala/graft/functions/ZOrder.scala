package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) curve encoding — the storage-layout primitive for
 * MULTI-dimensional scan locality: sorting a table by the interleaved
 * bits of two columns co-locates rows that are close in BOTH
 * dimensions, so a 2-D box predicate touches a handful of parquet row
 * groups instead of all of them (a single-column sort only prunes its
 * own dimension; ZOrderSpec proves the row-group-pruning win on scan
 * metrics).
 *
 * The encoding is the classic shift-mask bit spread (public-domain
 * "Interleave bits by Binary Magic Numbers" technique): pure integer
 * arithmetic over built-in codegen expressions (shiftleft / AND / OR),
 * no UDF, and bit-for-bit reproducible by any engine — q73 oracles the
 * curve itself against the same arithmetic in SQL.
 */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions 0,2,..,30. */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit non-negative coordinates: x on
    * even bits, y on odd bits. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
}
