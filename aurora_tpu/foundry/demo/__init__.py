"""Demo helpers for the serving stack (reference: aurora/foundry/demo/)."""
