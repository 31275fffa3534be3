"""torchaudio.functional stand-in (nothing from it is exercised by the
parity runs; present so `import torchaudio.functional` resolves)."""
