"""Structured Streaming layer: the reference's stateful wire-session
semantics (SURVEY.md §2.8) as streaming operators."""
