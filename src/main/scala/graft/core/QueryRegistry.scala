package graft.core

/** Central registry of every engine query exposed to the driver contract
  * (SparkEntry.queries / oracleSql) and to Bench.
  */
object QueryRegistry {
  def all: Seq[Q] =
    graft.operators.Relational.queries ++
      graft.operators.AsOf.queries ++
      graft.operators.Scalars.queries ++
      graft.operators.EventPipeline.queries ++
      graft.operators.Sinks.queries ++
      graft.operators.Snapshot.queries ++
      graft.operators.Api.queries ++
      graft.operators.EventUnion.queries ++
      graft.operators.EventCatalog.queries ++
      graft.operators.TextOps.queries ++
      graft.operators.QualityOps.queries ++
      graft.operators.Multimodal.queries ++
      graft.operators.VectorOps.queries ++
      graft.operators.ScaleOps.queries ++
      graft.operators.Reports.queries ++
      graft.operators.DataQuality.queries

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
