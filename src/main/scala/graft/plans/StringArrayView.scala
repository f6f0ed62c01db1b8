package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, StringType}

/** Read-only, string-only [[ArrayData]] base for lazy gram views
  * ([[CharGramArray]], [[WordGramArray]]): subclasses implement just
  * `numElements` and `getUTF8String`; everything else — the mutation
  * guards and the non-string accessors no caller can legally hit — is
  * shared here. */
abstract class StringArrayView extends ArrayData {
  override def isNullAt(i: Int): Boolean = false
  override def array: Array[Any] =
    Array.tabulate[Any](numElements())(getUTF8String)
  override def copy(): ArrayData = new GenericArrayData(array)
  override def setNullAt(i: Int): Unit =
    throw new UnsupportedOperationException(s"$viewName is read-only")
  override def update(i: Int, v: Any): Unit =
    throw new UnsupportedOperationException(s"$viewName is read-only")
  protected def viewName: String = getClass.getSimpleName
  // only STRING elements exist in these arrays
  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"$viewName has string elements, not $what")
  override def getBoolean(i: Int): Boolean = unsupported("boolean")
  override def getByte(i: Int): Byte = unsupported("byte")
  override def getShort(i: Int): Short = unsupported("short")
  override def getInt(i: Int): Int = unsupported("int")
  override def getLong(i: Int): Long = unsupported("long")
  override def getFloat(i: Int): Float = unsupported("float")
  override def getDouble(i: Int): Double = unsupported("double")
  override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal =
    unsupported("decimal")
  override def getBinary(i: Int): Array[Byte] = unsupported("binary")
  override def getInterval(i: Int): org.apache.spark.unsafe.types.CalendarInterval =
    unsupported("interval")
  override def getStruct(i: Int, numFields: Int): InternalRow = unsupported("struct")
  override def getArray(i: Int): ArrayData = unsupported("array")
  override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData =
    unsupported("map")
  override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal =
    unsupported("variant")
  override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal =
    unsupported("geography")
  override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal =
    unsupported("geometry")
  override def get(i: Int, dt: DataType): AnyRef = dt match {
    case StringType => getUTF8String(i)
    case _ => unsupported(dt.simpleString)
  }
}
