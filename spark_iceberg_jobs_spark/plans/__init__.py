# Plan-level tooling: DDL generation, physical layout lab, plan-shape checks.
