package graft.tracks

/** Interpolating splines with scipy-compatible semantics, for the
  * reference's `equal_timestep` track resampling
  * (src/climada/hazard/tc_tracks.py:1417-1465): lat/lon are
  * interpolated with `interp1d` of order min(2, n-2) ∈ {linear,
  * quadratic, cubic}; cubic means the NOT-A-KNOT boundary condition
  * (third-derivative continuity at the second and second-to-last
  * knots) — the scipy default for interpolating cubic splines.
  *
  * The not-a-knot system is solved by substituting the boundary
  * conditions into the first/last interior moment equations and
  * running the Thomas algorithm on the reduced tridiagonal system —
  * O(n) per track, exact for polynomials up to degree 3.
  */
object CubicSpline {

  /** Second-derivative moments M_i of the not-a-knot cubic spline
    * through (xs, ys). Requires n >= 4 strictly increasing xs. */
  def notAKnotMoments(xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 4, s"not-a-knot needs >= 4 points, got $n")
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val r = Array.tabulate(n - 2)(i =>
      6.0 * ((ys(i + 2) - ys(i + 1)) / h(i + 1) - (ys(i + 1) - ys(i)) / h(i)))

    // interior unknowns M_1..M_{n-2}; M_0, M_{n-1} eliminated via
    // not-a-knot: M_0 = ((h0+h1)M_1 - h0 M_2)/h1 (3rd-deriv cont. at x1)
    val m = n - 2
    val sub = new Array[Double](m)   // below-diagonal
    val diag = new Array[Double](m)
    val sup = new Array[Double](m)   // above-diagonal
    var i = 0
    while (i < m) {
      sub(i) = h(i)
      diag(i) = 2.0 * (h(i) + h(i + 1))
      sup(i) = h(i + 1)
      i += 1
    }
    // fold M_0 into row 0
    diag(0) += h(0) * (h(0) + h(1)) / h(1)
    if (m > 1) sup(0) -= h(0) * h(0) / h(1)
    // fold M_{n-1} into last row: M_{n-1} = ((h_{n-2}+h_{n-3})M_{n-2} - h_{n-2} M_{n-3})/h_{n-3}
    diag(m - 1) += h(n - 2) * (h(n - 2) + h(n - 3)) / h(n - 3)
    if (m > 1) sub(m - 1) -= h(n - 2) * h(n - 2) / h(n - 3)

    // Thomas algorithm
    val c = new Array[Double](m)
    val d = new Array[Double](m)
    c(0) = sup(0) / diag(0)
    d(0) = r(0) / diag(0)
    i = 1
    while (i < m) {
      val w = diag(i) - sub(i) * c(i - 1)
      c(i) = sup(i) / w
      d(i) = (r(i) - sub(i) * d(i - 1)) / w
      i += 1
    }
    val mm = new Array[Double](n)
    mm(m) = d(m - 1)
    i = m - 1
    while (i >= 1) { mm(i) = d(i - 1) - c(i - 1) * mm(i + 1); i -= 1 }
    mm(0) = ((h(0) + h(1)) * mm(1) - h(0) * mm(2)) / h(1)
    mm(n - 1) = ((h(n - 2) + h(n - 3)) * mm(n - 2) - h(n - 2) * mm(n - 3)) / h(n - 3)
    mm
  }

  /** Evaluate the cubic spline with moments `mm` at each xq (clamped
    * to the knot range — queries outside are not expected). */
  def evalCubic(xs: Array[Double], ys: Array[Double], mm: Array[Double],
                xq: Array[Double]): Array[Double] = {
    val n = xs.length
    xq.map { x =>
      var i = java.util.Arrays.binarySearch(xs, x)
      if (i >= 0) ys(i)
      else {
        i = math.min(math.max(-i - 2, 0), n - 2)
        val h = xs(i + 1) - xs(i)
        val t = x - xs(i)
        val b = (ys(i + 1) - ys(i)) / h - h * (2.0 * mm(i) + mm(i + 1)) / 6.0
        ys(i) + b * t + mm(i) / 2.0 * t * t + (mm(i + 1) - mm(i)) / (6.0 * h) * t * t * t
      }
    }
  }

  /** Piecewise-linear interpolation (order-1 path, and all data vars). */
  def evalLinear(xs: Array[Double], ys: Array[Double], xq: Array[Double]): Array[Double] = {
    val n = xs.length
    xq.map { x =>
      var i = java.util.Arrays.binarySearch(xs, x)
      if (i >= 0) ys(i)
      else {
        i = math.min(math.max(-i - 2, 0), n - 2)
        ys(i) + (ys(i + 1) - ys(i)) * (x - xs(i)) / (xs(i + 1) - xs(i))
      }
    }
  }

  /** The unique parabola through exactly three points (scipy
    * 'quadratic' for n=3). */
  def evalQuadratic3(xs: Array[Double], ys: Array[Double], xq: Array[Double]): Array[Double] = {
    require(xs.length == 3)
    val Array(x0, x1, x2) = xs
    val Array(y0, y1, y2) = ys
    xq.map { x =>
      y0 * (x - x1) * (x - x2) / ((x0 - x1) * (x0 - x2)) +
      y1 * (x - x0) * (x - x2) / ((x1 - x0) * (x1 - x2)) +
      y2 * (x - x0) * (x - x1) / ((x2 - x0) * (x2 - x1))
    }
  }

  /** scipy-`interp1d`-order dispatch: order = min(2, n-2). */
  def interpolate(xs: Array[Double], ys: Array[Double], xq: Array[Double]): Array[Double] =
    math.min(2, xs.length - 2) match {
      case k if k <= 0 => evalLinear(xs, ys, xq)
      case 1 => evalQuadratic3(xs, ys, xq)
      case _ => evalCubic(xs, ys, notAKnotMoments(xs, ys), xq)
    }
}
