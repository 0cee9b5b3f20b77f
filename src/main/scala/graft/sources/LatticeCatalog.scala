package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 catalog plugin — the last rung of the extension ladder
  * (source → expressions → optimizer rule → plan/strategy → V2 table →
  * V2 CATALOG): registers the lattice as SQL-addressable tables and its
  * derivation as SQL-addressable functions, so a pure-SQL user reaches
  * the connector with
  *
  *   SET spark.sql.catalog.graft = graft.sources.LatticeCatalog
  *   SELECT count(*) FROM graft.gen.lattice_20000 WHERE id >= 5000 ...
  *   SELECT graft.gen.lattice_lat(7)
  *
  * Table identifiers are `lattice_<n>` (row count encoded in the name —
  * a read-only generated catalog has no state to store); every pushdown
  * tier of [[LatticeSource]] rides along unchanged, catalog-routed scans
  * included (spec-pinned). Mutations throw: the catalog is a view of a
  * derivation, not storage.
  */
class LatticeCatalog extends CatalogPlugin with TableCatalog with FunctionCatalog {

  private var catalogName = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array("gen")

  private val TablePat = "lattice_([0-9]+)".r

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "lattice_20000"))

  override def loadTable(ident: Identifier): Table = ident.name() match {
    case TablePat(n) => new LatticeTable(n.toLong, 8)
    case _           => throw new NoSuchTableException(ident)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("lattice catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("lattice catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("lattice catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("lattice catalog is read-only")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "lattice_lat"),
      Identifier.of(namespace, "lattice_lon"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    ident.name() match {
      case "lattice_lat" => new LatticeDeriveFunction("lattice_lat", LatticeTable.lat)
      case "lattice_lon" => new LatticeDeriveFunction("lattice_lon", LatticeTable.lon)
      case _             => throw new NoSuchFunctionException(ident)
    }
}

/** V2 catalog function wrapping one shared lattice derivation — the same
  * constants the connector and q_join_spatial use, now SQL-addressable. */
class LatticeDeriveFunction(fname: String, f: Long => Double)
    extends UnboundFunction {

  override def name(): String = fname
  override def description(): String = s"$fname(id BIGINT) -> DOUBLE"

  override def bind(inputType: StructType): BoundFunction = {
    // accept any integral width: declaring LongType below makes Spark
    // insert the upcast during resolution
    val ok = inputType.fields.length == 1 &&
      (inputType.fields(0).dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      })
    if (!ok)
      throw new UnsupportedOperationException(s"$fname expects (BIGINT)")
    new ScalarFunction[Double] {
      override def inputTypes(): Array[DataType] = Array(LongType)
      override def resultType(): DataType = DoubleType
      override def name(): String = fname
      override def canonicalName(): String = s"graft.$fname"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Double =
        f(input.getLong(0))
    }
  }
}
