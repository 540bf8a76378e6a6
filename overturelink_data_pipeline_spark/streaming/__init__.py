"""Structured Streaming extension (SURVEY.md §2.8: the reference is
strictly batch — streaming is the engine's beyond-parity layer, built
on the file source + Trigger.AvailableNow so every streaming query is
replayable over static test data)."""
