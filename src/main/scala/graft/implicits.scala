package graft

import org.apache.spark.sql.Column

/** Column extension methods.
  *
  * Scala analog of the reference's `KolangColumn` subclass
  * (reference kolang/column.py:38) — instead of a metaclass that
  * rewraps every returned Column, we use a zero-allocation implicit
  * value class, the idiomatic Scala way to extend `Column`.
  */
object implicits {

  implicit class RichColumn(private val c: Column) extends AnyVal {

    /** True when this column is NULL or is contained in `vals`
      * (reference kolang/column.py:43 `isNullOrIn`).
      */
    def isNullOrIn(vals: Any*): Column = c.isNull || c.isin(vals: _*)
  }
}
