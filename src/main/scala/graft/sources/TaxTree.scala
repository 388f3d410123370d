package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * NCBI taxonomy tree with nested-set (lft/rgt) numbering — the dimension
 * preparation job (reference: lib/Bio/Metadata/TaxTree.pm:102-218; expected
 * numbering pinned by t/08_tax_tree.t:41-61, e.g. 12 nodes -> root lft=1
 * rgt=24).
 *
 * The build is driver-side: taxonomy dims are broadcast-scale (NCBI is
 * ~2.5M nodes) and nested-set numbering is an inherently sequential DFS;
 * the OUTPUT is a DataFrame dimension ready for broadcast joins, and DFS
 * export order is `ORDER BY lft`.
 */
object TaxTree {

  final case class Node(
      taxId: Long, parentTaxId: Long, rank: String, name: String,
      var lft: Long = 0, var rgt: Long = 0)

  final case class Tree(root: Node, byId: Map[Long, Node], dfsOrder: Seq[Node])

  /** Build from parsed nodes+names. Children attach in ascending tax-id
   * order (the reference appends while looping tax ids ascending,
   * TaxTree.pm:186-199); the root is the self-parenting node. */
  def build(nodes: Seq[(Long, Long, String)], names: Map[Long, String]): Tree = {
    val ns: Map[Long, Node] = nodes.map { case (id, pid, rank) =>
      id -> Node(id, pid, rank, names.getOrElse(id, null))
    }.toMap
    val root = ns.values.find(n => n.parentTaxId == n.taxId)
      .getOrElse(throw new IllegalArgumentException("no self-parenting root node"))
    val children: Map[Long, Seq[Node]] = nodes
      .filter { case (id, pid, _) => id != pid }
      .map { case (id, _, _) => ns(id) }
      .groupBy(_.parentTaxId)
      .map { case (p, cs) => p -> cs.sortBy(_.taxId) }

    // iterative DFS assigning lft on entry, rgt on exit (TaxTree.pm:207-212)
    var counter = 1L
    val order = scala.collection.mutable.ArrayBuffer.empty[Node]
    def visit(n: Node): Unit = {
      n.lft = counter; counter += 1
      order += n
      children.getOrElse(n.taxId, Nil).foreach(visit)
      n.rgt = counter; counter += 1
    }
    visit(root)
    Tree(root, ns, order.toSeq)
  }

  def fromFiles(namesPath: String, nodesPath: String): Tree =
    build(LookupSources.nodes(nodesPath), LookupSources.scientificNames(namesPath))

  /** (tax_id, name, lft, rgt, parent_tax_id) rows, DFS order or tax-id
   * (file) order (reference: TaxTree.pm:253-289). */
  def nodeValues(tree: Tree, dfs: Boolean = false): Seq[(Long, String, Long, Long, Long)] = {
    val ns = if (dfs) tree.dfsOrder else tree.byId.values.toSeq.sortBy(_.taxId)
    ns.map(n => (n.taxId, n.name, n.lft, n.rgt, n.parentTaxId))
  }

  /** The dim_taxonomy DataFrame; `orderBy("lft")` is DFS order. */
  def toDim(spark: SparkSession, tree: Tree): DataFrame = {
    import spark.implicits._
    nodeValues(tree).toDF("tax_id", "name", "lft", "rgt", "parent_tax_id")
  }

  /** Nested-set descendant predicate: node d is inside ancestor a iff
   * a.lft < d.lft && d.rgt < a.rgt — the point of the numbering: subtree
   * membership becomes a range test usable in a broadcast range join. */
  def isDescendant(dLft: Long, aLft: Long, aRgt: Long): Boolean =
    aLft < dLft && dLft < aRgt
}
