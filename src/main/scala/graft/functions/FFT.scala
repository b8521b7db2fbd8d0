package graft.functions

/**
 * Minimal iterative radix-2 complex FFT, used for MASS-style sliding dot
 * products (`slidingDots`): all n-m+1 pattern-vs-window dot products in
 * O(L log L) instead of O(n*m) — the published MASS trick (Mueen et al.)
 * that stumpy's `match` builds on. Pure JVM doubles, fixed operation
 * order — deterministic across runs and machines.
 */
object FFT {

  /** In-place complex FFT (inverse when `inv`); lengths must be a power
    * of two. */
  def transform(re: Array[Double], im: Array[Double], inv: Boolean): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT length must be a power of two, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (inv) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val ar = re(blk + k); val ai = im(blk + k)
          val br = re(blk + k + half); val bi = im(blk + k + half)
          val tr = br * cr - bi * ci
          val ti = br * ci + bi * cr
          re(blk + k) = ar + tr; im(blk + k) = ai + ti
          re(blk + k + half) = ar - tr; im(blk + k + half) = ai - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
    if (inv) {
      var k = 0
      while (k < n) { re(k) /= n; im(k) /= n; k += 1 }
    }
  }

  /** Dot product of `q` against every length-m window of `t`:
    * result(s) = sum_k q(k) * t(s+k), for s in 0..n-m. One linear
    * convolution of t with reversed q via three FFTs. */
  def slidingDots(q: Array[Double], t: Array[Double]): Array[Double] = {
    val m = q.length
    val n = t.length
    var L = 1
    while (L < n + m) L <<= 1
    val ar = new Array[Double](L); val ai = new Array[Double](L)
    val br = new Array[Double](L); val bi = new Array[Double](L)
    System.arraycopy(t, 0, ar, 0, n)
    var k = 0
    while (k < m) { br(k) = q(m - 1 - k); k += 1 }
    transform(ar, ai, inv = false)
    transform(br, bi, inv = false)
    k = 0
    while (k < L) {
      val r = ar(k) * br(k) - ai(k) * bi(k)
      val i2 = ar(k) * bi(k) + ai(k) * br(k)
      ar(k) = r; ai(k) = i2
      k += 1
    }
    transform(ar, ai, inv = true)
    val out = new Array[Double](n - m + 1)
    var s = 0
    while (s < out.length) { out(s) = ar(s + m - 1); s += 1 }
    out
  }
}
