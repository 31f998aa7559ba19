// Example external C++ mapper (stdin/stdout pipe contract).
// Per-chunk partial word counts — the combiner contract reference
// mappers follow. Own implementation for the stdin/stdout surface; the
// reference's exec contract is argv-file based (Worker.java:136-158).
#include <iostream>
#include <string>
#include <unordered_map>
#include <cctype>

int main() {
    std::ios::sync_with_stdio(false);
    std::unordered_map<std::string, long long> counts;
    std::string tok;
    while (std::cin >> tok) {
        for (auto &ch : tok) ch = std::tolower(static_cast<unsigned char>(ch));
        ++counts[tok];
    }
    for (const auto &kv : counts)
        std::cout << kv.first << ' ' << kv.second << '\n';
    return 0;
}
