package graft.model

import org.apache.spark.sql.{Encoder, Encoders}
import graft.backend.{BatchStatusEvent, BatchVacuumMarker, CronLogRecord,
  PurgeMarker, Tombstone}

/** Hoisted singleton encoders for every engine record type.
  *
  * `import spark.implicits._` resolves `Encoder[T]` through the generic
  * `newProductEncoder` implicit DEF — a fresh runtime-reflection encoder
  * derivation on EVERY call-site invocation, measured at ~1.3 ms
  * (QuickProbe `__client_profile`, `implicit_encoder_resolution`). A
  * single `readyJobs` visibility read resolves four of them (Job,
  * CompletionEvent, Tombstone, PurgeMarker) — ~5 ms of pure reflection
  * per read, and every per-call append paid it again on a path whose
  * actual write costs ~12 µs.
  *
  * These vals are derived once at class-load. Importing
  * `ModelEncoders._` beside `spark.implicits._` is safe: an implicit
  * VAL of the exact type is more specific than the generic derivation,
  * so it wins resolution without ambiguity, and all other implicits
  * (column interpolators, tuple/primitive encoders, `toDS`) still come
  * from the session import.
  */
object ModelEncoders {
  implicit val jobEncoder: Encoder[Job] = Encoders.product[Job]
  implicit val completionEventEncoder: Encoder[CompletionEvent] =
    Encoders.product[CompletionEvent]
  implicit val claimEventEncoder: Encoder[ClaimEvent] =
    Encoders.product[ClaimEvent]
  implicit val tombstoneEncoder: Encoder[Tombstone] = Encoders.product[Tombstone]
  implicit val purgeMarkerEncoder: Encoder[PurgeMarker] = Encoders.product[PurgeMarker]
  implicit val cronLogRecordEncoder: Encoder[CronLogRecord] =
    Encoders.product[CronLogRecord]
  implicit val cronEntryEncoder: Encoder[CronEntry] = Encoders.product[CronEntry]
  implicit val queueDeclEncoder: Encoder[QueueDecl] = Encoders.product[QueueDecl]
  implicit val processHeartbeatEncoder: Encoder[ProcessHeartbeat] =
    Encoders.product[ProcessHeartbeat]
  implicit val batchMetaEncoder: Encoder[BatchMeta] = Encoders.product[BatchMeta]
  implicit val batchStatusEventEncoder: Encoder[BatchStatusEvent] =
    Encoders.product[BatchStatusEvent]
  implicit val batchVacuumMarkerEncoder: Encoder[BatchVacuumMarker] =
    Encoders.product[BatchVacuumMarker]
}
