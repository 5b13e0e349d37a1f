package graft.sinks

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** Embedded-Derby warehouse support for the JDBC sink.
  *
  * Spark's built-in Derby dialect maps StringType to CLOB, and its JDBC
  * writer then issues `setNull(Types.CLOB)` for null strings — which
  * Derby's embedded driver rejects against VARCHAR columns ("attempt to
  * get a data value of type 'VARCHAR' from a data value of type
  * 'CLOB'"). This dialect maps StringType to Derby's widest VARCHAR
  * instead, so both the generated DDL and the null-parameter type agree
  * with string-typed warehouse columns. Registered dialects are
  * consulted in registration order, so this one shadows the built-in
  * for `jdbc:derby:` URLs once [[register]] is called.
  */
class DerbyVarcharDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:derby")

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType  => Some(JdbcType("VARCHAR(32672)", Types.VARCHAR))
    case ShortType   => Some(JdbcType("SMALLINT", Types.SMALLINT))
    case ByteType    => Some(JdbcType("SMALLINT", Types.SMALLINT))
    case FloatType   => Some(JdbcType("REAL", Types.REAL))
    case DoubleType  => Some(JdbcType("DOUBLE", Types.DOUBLE))
    case BooleanType => Some(JdbcType("BOOLEAN", Types.BOOLEAN))
    case _           => None // getCommonJDBCType covers the rest
  }
}

object DerbyWarehouse {
  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Idempotently register the Derby warehouse dialect. */
  def register(): Unit =
    if (registered.compareAndSet(false, true))
      JdbcDialects.registerDialect(new DerbyVarcharDialect)
}
