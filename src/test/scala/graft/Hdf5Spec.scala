package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ClimadaSources, Hdf5File}

/** The from-scratch HDF5 reader against the reference's own fixture
  * files — three different writer toolchains (MATLAB 7.3, netcdf-c
  * dense-link groups, xarray/h5py compact-link groups) exercising
  * userblock detection, v1+v2 object headers, compact/contiguous
  * layouts, fractal-heap links, fill values, and CF time decode.
  */
class Hdf5Spec extends AnyFunSuite {

  private val dataDir = "/root/reference/IBF-Typhoon-model/src/climada/hazard/test/data"

  test("MATLAB 7.3: userblock, symbol-table groups, compact doubles, char arrays") {
    val f = Hdf5File.open(s"$dataDir/centr_brb_test.mat")
    assert(f.list("/").contains("centroids"))
    val lat = f.readDoubles("/centroids/lat")
    assert(lat.length == 296)
    assert(math.abs(lat(0) - 13.125) < 1e-12)
    assert(f.readMatString("/centroids/comment").startsWith("Barbados"))
  }

  test("netcdf-c track file: OHDR headers, dense fractal-heap links, CF hours") {
    val f = Hdf5File.open(s"$dataDir/1988021S12080.nc")
    val names = f.list("/")
    assert(names.contains("lat") && names.contains("central_pressure"))
    assert(f.readDoubles("/lat").length == 93)
    val units = f.attributes("/time")("units").asInstanceOf[String]
    assert(units == "hours since 1988-01-21 00:00:00")
  }

  test("compact-link nc: contiguous data and unallocated fill-value datasets") {
    val f = Hdf5File.open(s"$dataDir/chaz_test_tracks.nc")
    assert(f.list("/").toSet ==
      Set("lifelength", "ensembleNum", "stormID", "longitude", "time", "latitude", "Mwspd"))
    val wspd = f.readDoubles("/Mwspd")
    assert(f.dims("/Mwspd").toSeq == Seq(3L, 5L, 6L))
    assert(wspd.length == 90 && wspd.exists(!_.isNaN))
    // lifelength was never written: unallocated contiguous → fill value
    assert(f.readDoubles("/lifelength").length == 5)
  }

  test("readIbtracsNetcdf: tracks DataFrame with decoded timestamps") {
    val spark = Engine.local(4)
    val t = ClimadaSources.readIbtracsNetcdf(spark, s"$dataDir/1988021S12080.nc")
      .orderBy("time").collect()
    assert(t.length == 93)
    assert(t.head.getAs[java.sql.Timestamp]("time").toString.startsWith("1988-01-21 00:00"))
    val lat = t.head.getAs[Double]("lat")
    assert(lat < 0 && lat > -40) // southern-hemisphere storm
  }

  test("CF time decode units variants") {
    assert(ClimadaSources.cfTimeToMicros(Array(1.0), "days since 1970-01-01").head == 86400000000L)
    assert(ClimadaSources.cfTimeToMicros(Array(2.5), "hours since 1970-01-01 00:00:00").head == 9000000000L)
    assert(ClimadaSources.cfTimeToMicros(Array(60.0), "seconds since 1969-12-31 23:59:00").head == 0L)
  }
}
