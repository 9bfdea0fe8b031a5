def main():
    raise SystemExit("pipeline CLI not yet wired")
